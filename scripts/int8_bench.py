"""Does int8-quantized adjacency cut the propagation's HBM traffic?

The DenseJoint epoch is HBM-bound on the adjacency stream (PARITY.md:
605 GB/s, 74% of the v5e roof). Storing R-hat as int8 with a per-row scale
halves those bytes IF the int8->bf16 dequant fuses into the dot instead of
materializing a bf16 copy in HBM. This measures that directly: K chained
applications of the joint propagation, bf16 vs int8-dequant, fwd and
fwd+bwd, at lastfm shape on the real chip.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

U, I, D = 1892, 17632, 50
K = 20


def timeit(name, f, *args, iters=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters / K
    gb = U * I / dt / 1e9
    print(f"{name}: {dt * 1e3:.3f} ms/application "
          f"({gb:.0f} G adj-elements/s)")
    return dt


def main():
    rng = np.random.default_rng(0)
    r = np.zeros((U, I), dtype=np.float32)
    # lastfm-like sparsity: 50 rated items per user
    for u in range(U):
        cols = rng.choice(I, size=50, replace=False)
        r[u, cols] = 1.0 / np.sqrt(50) / np.sqrt(rng.uniform(1, 400, size=50))

    r_bf = jnp.asarray(r, dtype=jnp.bfloat16)
    rt_bf = jnp.asarray(np.ascontiguousarray(r.T), dtype=jnp.bfloat16)

    # per-user-row uint8 quantization
    smax = r.max(axis=1)
    scale = np.where(smax > 0, smax / 127.0, 1.0).astype(np.float32)
    q = np.rint(r / scale[:, None]).astype(np.int8)
    err = np.abs(q.astype(np.float32) * scale[:, None] - r).max()
    print(f"quant: max abs err {err:.2e} (max val {smax.max():.3f})")
    q_d = jnp.asarray(q)
    qt_d = jnp.asarray(np.ascontiguousarray(q.T))
    s_d = jnp.asarray(scale)

    x0 = jnp.asarray(
        rng.standard_normal((U + I, D), dtype=np.float32) * 0.1
    )

    def joint_bf16(x):
        xu = x[:U].astype(jnp.bfloat16)
        xi = x[U:].astype(jnp.bfloat16)
        ou = jnp.dot(r_bf, xi, preferred_element_type=jnp.float32)
        oi = jnp.dot(rt_bf, xu, preferred_element_type=jnp.float32)
        return jnp.concatenate([ou, oi])

    def joint_int8(x):
        xu = x[:U].astype(jnp.bfloat16)
        xi = x[U:].astype(jnp.bfloat16)
        # dequant: out_u = s ⊙ (Q @ xi);  out_i = Qᵀ @ (s ⊙ xu)
        ou = jnp.dot(
            q_d.astype(jnp.bfloat16), xi, preferred_element_type=jnp.float32
        ) * s_d[:, None]
        oi = jnp.dot(
            qt_d.astype(jnp.bfloat16),
            xu * s_d[:, None].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return jnp.concatenate([ou, oi])

    def scan_fwd(prop):
        @jax.jit
        def f(x):
            def step(c, _):
                return prop(c), ()

            y, _ = jax.lax.scan(step, x, None, length=K)
            return y

        return f

    def scan_grad(prop):
        @jax.jit
        def f(x):
            def loss(x):
                def step(c, _):
                    return prop(c), ()

                y, _ = jax.lax.scan(step, x, None, length=K)
                return jnp.sum(y * y)

            return jax.grad(loss)(x)

        return f

    # numerics sanity
    y_bf = scan_fwd(joint_bf16)(x0)
    y_i8 = scan_fwd(joint_int8)(x0)
    rel = float(jnp.linalg.norm(y_bf - y_i8) / (jnp.linalg.norm(y_bf) + 1e-30))
    print(f"K={K} chained propagation rel diff int8 vs bf16: {rel:.3e}")

    t_bf = timeit("bf16 fwd      ", scan_fwd(joint_bf16), x0)
    t_i8 = timeit("int8 fwd      ", scan_fwd(joint_int8), x0)
    t_bfg = timeit("bf16 fwd+bwd  ", scan_grad(joint_bf16), x0)
    t_i8g = timeit("int8 fwd+bwd  ", scan_grad(joint_int8), x0)
    print(f"speedup fwd {t_bf / t_i8:.2f}x, fwd+bwd {t_bfg / t_i8g:.2f}x")


if __name__ == "__main__":
    main()
