"""int8 single-pass dual kernel vs the XLA int8 two-dot path.

At the int8-quantized epoch, propagation IS the whole step (PARITY d-sweep:
152 applications × 0.136 ms ≈ the 20.7 ms epoch), so the remaining lever is
a single HBM pass per application: the dual-product Pallas kernel reading
the int8 table once (quarter of the bf16 two-matmul bytes).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

U, I, D = 1889, 15322, 50
K = 20


def timeit(name, f, x, iters=10):
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters / K
    print(f"{name}: {dt * 1e3:.3f} ms/application", flush=True)
    return dt


def main():
    from qrec_tpu.ops.pallas_kernels import bipartite_dual_matmul, dual_pad_sizes
    from qrec_tpu.ops.spmm import _int8_call

    rng = np.random.default_rng(0)
    q = rng.integers(0, 127, size=(U, I)).astype(np.int8)
    s = (rng.random(U, dtype=np.float32) * 0.01 + 0.001).astype(np.float32)
    q_d = jnp.asarray(q)
    qt_d = jnp.asarray(np.ascontiguousarray(q.T))
    s_d = jnp.asarray(s)

    up, ip = dual_pad_sizes(U, I, sublane=32)
    qp = np.zeros((up, ip), dtype=np.int8)
    qp[:U, :I] = q
    qp_d = jnp.asarray(qp)

    x0 = jnp.asarray(rng.standard_normal((U + I, D), dtype=np.float32) * 0.1)

    def xla_apply(x):
        return _int8_call(q_d, qt_d, s_d, x)

    def dual_apply(x):
        xu = (x[:U] * s_d[:, None]).astype(jnp.bfloat16)
        xi = x[U:].astype(jnp.bfloat16)
        if up != U:
            xu = jnp.concatenate([xu, jnp.zeros((up - U, D), xu.dtype)])
        if ip != I:
            xi = jnp.concatenate([xi, jnp.zeros((ip - I, D), xi.dtype)])
        ou_raw, oi = bipartite_dual_matmul(qp_d, xu, xi)
        ou = ou_raw[:U] * s_d[:, None]
        return jnp.concatenate([ou, oi[:I]])

    def scan_of(apply):
        @jax.jit
        def f(x):
            def step(c, _):
                return apply(c), ()

            y, _ = jax.lax.scan(step, x, None, length=K)
            return y

        return f

    # numerics: dual vs XLA int8 (both dequantize identically; the dual
    # path scales xu pre-matmul in bf16 vs f32 — bf16-class delta expected)
    y_x = scan_of(xla_apply)(x0)
    y_d = scan_of(dual_apply)(x0)
    rel = float(jnp.linalg.norm(y_x - y_d) / (jnp.linalg.norm(y_x) + 1e-30))
    print(f"rel diff dual-int8 vs xla-int8 over K={K}: {rel:.3e}")

    t_x = timeit("xla  int8 two-dot", scan_of(xla_apply), x0)
    t_d = timeit("dual int8 kernel ", scan_of(dual_apply), x0)
    print(f"speedup {t_x / t_d:.2f}x")


if __name__ == "__main__":
    main()
