"""Microbenchmarks: SpMM fwd/bwd, negative sampler variants, top-k eval.
Usage: python scripts/micro_bench.py"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def main():
    from bench import build_problem
    from qrec_tpu.data.graph import joint_normalized_adjacency
    from qrec_tpu.ops import sampling as S
    from qrec_tpu.ops.spmm import DeviceCOO, spmm

    conf, data = build_problem()
    adj = DeviceCOO.from_host(joint_normalized_adjacency(data))
    n = adj.num_rows
    d = 50
    e = jnp.asarray(np.random.RandomState(0).randn(n, d).astype(np.float32))
    print(f"graph: {n} nodes, {adj.vals.shape[0]} nnz, d={d}", flush=True)

    f_spmm = jax.jit(lambda e: spmm(adj, e))
    t = timeit(f_spmm, e)
    print(f"spmm fwd: {t * 1e3:.2f} ms", flush=True)

    g_spmm = jax.jit(jax.grad(lambda e: jnp.sum(spmm(adj, e) ** 2)))
    t = timeit(g_spmm, e)
    print(f"spmm fwd+bwd: {t * 1e3:.2f} ms", flush=True)

    # dense comparison (bf16 adjacency on MXU)
    dense = jnp.zeros((n, n), dtype=jnp.bfloat16).at[adj.rows, adj.cols].set(
        adj.vals.astype(jnp.bfloat16)
    )
    f_dense = jax.jit(
        lambda e: jnp.dot(dense, e.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    )
    t = timeit(f_dense, e)
    print(f"dense bf16 matmul: {t * 1e3:.2f} ms", flush=True)

    # sampler variants
    ta = {
        "u": jnp.asarray(data.train_u),
        "i": jnp.asarray(data.train_i),
        "indices": jnp.asarray(data.u_indices),
        "indptr": jnp.asarray(data.u_indptr),
    }
    ntrain = len(data.training_data)
    row_iters = S._bisect_iters(int(np.max(np.diff(data.u_indptr))))
    print(f"row_iters={row_iters}, ntrain={ntrain}", flush=True)

    f_pair = jax.jit(
        lambda rng: S.pairwise_epoch(
            rng, ta["u"], ta["i"], ta["indices"], ta["indptr"],
            num_items=data.num_items, batch_size=2000,
            num_tries=8, row_iters=row_iters,
        )
    )
    t = timeit(f_pair, jax.random.PRNGKey(0), n=10)
    print(f"pairwise_epoch (8 tries + fallback): {t * 1e3:.1f} ms", flush=True)

    users = ta["u"]
    f_member = jax.jit(
        lambda rng: S.sample_negatives(
            rng, users, data.num_items, ta["indices"], ta["indptr"],
            8, row_iters,
        )
    )
    t = timeit(f_member, jax.random.PRNGKey(0), n=10)
    print(f"sample_negatives alone: {t * 1e3:.1f} ms", flush=True)

    f_exact = jax.jit(
        lambda rng: S.sample_negatives_exact(
            rng, users, data.num_items, ta["indices"], ta["indptr"], row_iters
        )
    )
    t = timeit(f_exact, jax.random.PRNGKey(0), n=10)
    print(f"exact sampler alone: {t * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
