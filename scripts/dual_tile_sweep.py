"""Sweep dual-kernel tile sizes on TPU: per-application fwd+bwd time vs the
two-matmul XLA path, chained (data-dependent) calls so dispatch overlaps.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_problem
from qrec_tpu.ops import pallas_kernels as pk
from qrec_tpu.ops import spmm as sp_ops


def chained_time(fn, x, n=50):
    """Chain calls through a data dependency so the device pipeline stays
    full (independent same-input calls measure dispatch, not compute)."""
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(n):
        x = fn(x) * 0.5 + x * 0.5  # keep magnitude stable, forge dependency
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / n


def main():
    conf, data = build_problem()
    d = 50
    rng = np.random.RandomState(0)

    adj0 = sp_ops.DenseJoint.from_interactions(data)
    n = adj0.num_rows
    nu, ni = adj0.num_users, adj0.r_hat.shape[1]
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))

    g_xla = jax.jit(
        jax.grad(lambda x: jnp.sum(sp_ops._dense_joint_matmul(adj0, x) ** 2))
    )
    print(f"xla 2-matmul fwd+bwd (chained): {chained_time(g_xla, x) * 1e3:.2f} ms", flush=True)

    for ut, it in [(512, 1024), (1024, 2048), (2048, 4096), (512, 4096)]:
        pk.DUAL_U_TILE, pk.DUAL_I_TILE = ut, it
        adj = sp_ops.DenseJoint.from_interactions(data, dual=True)
        g_dual = jax.jit(
            jax.grad(
                lambda x: jnp.sum(
                    sp_ops._dual_joint_matmul(adj.r_hat_p, x, nu, ni, False) ** 2
                )
            )
        )
        try:
            t = chained_time(g_dual, x)
            print(f"dual tiles ({ut},{it}): fwd+bwd {t * 1e3:.2f} ms", flush=True)
        except Exception as e:
            print(f"dual tiles ({ut},{it}): FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
