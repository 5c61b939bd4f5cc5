"""Consolidated TPU verification: Pallas kernel numerics + timings, plus
full-protocol quality runs whose metrics feed PARITY.md.

Run as ONE process (the axon TPU serializes sessions):
    python scripts/tpu_verify.py [--quality]
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=20):
    import jax

    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def verify_kernels():
    import jax
    import jax.numpy as jnp

    from qrec_tpu.ops import losses as L
    from qrec_tpu.ops.pallas_kernels import (
        infonce_loss,
        masked_catalog_scores,
        masked_catalog_scores_xla,
    )
    from qrec_tpu.ops.sampling import pack_bitmask

    rng = np.random.RandomState(0)
    b, d, i = 256, 64, 20480
    u = jnp.asarray(rng.randn(b, d).astype(np.float32))
    v = jnp.asarray(rng.randn(i, d).astype(np.float32))
    indptr = [0]
    indices = []
    for _ in range(b):
        row = np.sort(rng.choice(i, size=50, replace=False))
        indices.extend(row)
        indptr.append(len(indices))
    mask = jnp.asarray(
        pack_bitmask(np.array(indptr), np.array(indices, dtype=np.int32), b, i)
    )
    got = masked_catalog_scores(u, v, mask, 0.0)
    jax.block_until_ready(got)
    print("[pallas] scorer compiled", flush=True)
    # compare on host against numpy (avoids a second TPU compile)
    exp = np.asarray(u) @ np.asarray(v).T
    mask_np = np.asarray(mask)
    for bi in range(b):
        rated = indices[indptr[bi]:indptr[bi + 1]]
        exp[bi, rated] = 0.0
    # default TPU matmul precision is bf16-multiply/f32-accumulate (same
    # precision class as the XLA eval path's jnp.dot) — compare RELATIVE to
    # the score scale, not absolutely, against the f32 host reference
    scale = float(np.abs(exp).max())
    diff = float(jnp.max(jnp.abs(got - exp))) / scale
    print(f"[pallas] scorer max rel diff vs f32 host: {diff:.2e}", flush=True)
    assert diff < 2e-2
    t_p = timeit(masked_catalog_scores, u, v, mask)
    print(f"[pallas] scorer {t_p * 1e3:.2f} ms", flush=True)

    b2, d2 = 2048, 64
    v1 = jnp.asarray(rng.randn(b2, d2).astype(np.float32))
    v2 = jnp.asarray(rng.randn(b2, d2).astype(np.float32))
    m2 = jnp.ones(b2)
    gl = infonce_loss(v1, v2, m2, 0.2)
    # host-side reference for the comparison (no second TPU compile)
    a1 = np.asarray(v1); a2 = np.asarray(v2)
    a1 = a1 / np.linalg.norm(a1, axis=1, keepdims=True)
    a2 = a2 / np.linalg.norm(a2, axis=1, keepdims=True)
    lg = (a1 @ a2.T) / 0.2
    lse = np.log(np.exp(lg - lg.max(1, keepdims=True)).sum(1)) + lg.max(1)
    el = float(np.sum(lse - np.diagonal(lg)))
    rel = abs(float(gl) - el) / abs(el)
    print(f"[pallas] infonce rel diff: {rel:.2e}", flush=True)
    assert rel < 1e-3
    t_p = timeit(jax.jit(lambda a, c: infonce_loss(a, c, m2, 0.2)), v1, v2)
    print(f"[pallas] infonce fwd {t_p * 1e3:.2f} ms", flush=True)

    # fused backward parity + the fwd+bwd crossover that justifies
    # SSL_PALLAS_MIN_ROWS (ops/losses.resolve_ssl_backend)
    def grad_pair(loss_fn, a, c, m):
        return jax.jit(
            jax.grad(lambda x, y: loss_fn(x, y, m, 0.2), argnums=(0, 1))
        )

    gp = grad_pair(infonce_loss, v1, v2, m2)
    gx = grad_pair(L.masked_infonce, v1, v2, m2)
    g1p, g2p = gp(v1, v2)
    g1x, g2x = gx(v1, v2)
    gscale = float(jnp.max(jnp.abs(g1x))) or 1.0
    gd = max(
        float(jnp.max(jnp.abs(g1p - g1x))), float(jnp.max(jnp.abs(g2p - g2x)))
    ) / gscale
    print(f"[pallas] infonce grad max rel diff vs XLA: {gd:.2e}", flush=True)
    assert gd < 2e-2
    # time K grad applications inside one jitted scan so the per-call
    # remote-dispatch latency (~2 ms through the axon tunnel) amortizes out
    K = 20

    def scan_grad(loss_fn, m):
        def f(va, vb):
            def step(c, _):
                g1, g2 = jax.grad(
                    lambda x, y: loss_fn(x, y, m, 0.2), argnums=(0, 1)
                )(c[0], c[1])
                return (c[0] - 1e-6 * g1, c[1] - 1e-6 * g2), ()

            (va, vb), _ = jax.lax.scan(step, (va, vb), None, length=K)
            return va, vb

        return jax.jit(f)

    for rows in (512, 1024, 2048, 4096):
        va = jnp.asarray(rng.randn(rows, d2).astype(np.float32))
        vb = jnp.asarray(rng.randn(rows, d2).astype(np.float32))
        mm = jnp.ones(rows)
        tp = timeit(scan_grad(infonce_loss, mm), va, vb, n=5) / K
        tx = timeit(scan_grad(L.masked_infonce, mm), va, vb, n=5) / K
        print(
            f"[pallas] infonce fwd+bwd rows={rows}: pallas {tp * 1e3:.3f} ms"
            f" vs XLA {tx * 1e3:.3f} ms ({tx / tp:.2f}x)",
            flush=True,
        )


def quality_runs():
    from qrec_tpu import ModelConf, QRec
    from qrec_tpu.ops.metrics import parse_measure

    results = {}
    for name, epochs in (
        ("BPR", 100), ("LightGCN", 120), ("SimGCL", 50), ("SGL", 50)
    ):
        conf = ModelConf(f"config/{name}.conf")
        conf.config["num.max.epoch"] = str(epochs)
        conf.config["output.setup"] = "off -dir ./results/"
        t0 = time.time()
        rec = QRec(conf, seed=1)
        measure = rec.execute()
        wall = time.time() - t0
        parsed = parse_measure(measure).get("Top 10", {})
        results[name] = {
            "epochs": epochs,
            "wall_seconds": round(wall, 1),
            **{k: round(v, 5) for k, v in parsed.items()},
        }
        print(f"[quality] {name}: {results[name]}", flush=True)
    print(json.dumps(results), flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", action="store_true")
    ap.add_argument("--kernels", action="store_true")
    args = ap.parse_args()
    if args.kernels or not args.quality:
        verify_kernels()
    if args.quality:
        quality_runs()
