"""Backend shootout at yelp2018 scale: XLA COO vs PaddedCOO (Pallas) vs
DenseJoint, fwd and fwd+bwd, timed inside one scan program."""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from qrec_tpu.data.graph import COO
from qrec_tpu.ops.spmm import DeviceCOO, PaddedCOO, spmm

K = 20
D = 64


def synth(num_users, num_items, nnz, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, num_users, size=nnz)
    ranks = np.arange(1, num_items + 1, dtype=np.float64)
    p = ranks**-0.9
    p /= p.sum()
    i = rng.choice(num_items, size=nnz, p=p)
    key = np.unique(u.astype(np.int64) * num_items + i)
    u = (key // num_items).astype(np.int32)
    i = (key % num_items).astype(np.int32)
    n = num_users + num_items
    r = sp.csr_matrix(
        (np.ones(len(u), np.float32), (u, i)), shape=(num_users, num_items)
    )
    a = sp.bmat([[None, r], [r.T, None]], format="csr")
    deg = np.asarray(a.sum(axis=1)).ravel()
    dinv = np.power(deg, -0.5, where=deg > 0, out=np.zeros_like(deg))
    a = sp.diags(dinv) @ a @ sp.diags(dinv)
    return COO.from_scipy(a.tocsr()), n


def timeit(name, f, x, iters=5):
    out = f(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters / K
    print(f"{name}: {dt * 1e3:.3f} ms per application")


def bench(adj, x, name):
    @jax.jit
    def scan_fwd(x):
        def step(c, _):
            return spmm(adj, c), ()

        y, _ = jax.lax.scan(step, x, None, length=K)
        return y

    @jax.jit
    def scan_grad(x):
        def loss(x):
            def step(c, _):
                return spmm(adj, c), ()

            y, _ = jax.lax.scan(step, x, None, length=K)
            return jnp.sum(y * y)

        return jax.grad(loss)(x)

    timeit(f"{name} fwd", scan_fwd, x)
    timeit(f"{name} fwd+bwd", scan_grad, x)


def main():
    coo, n = synth(19539, 21266, 450884)
    print(f"[shootout] nodes={n} edges={coo.nnz}")
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, D), dtype=np.float32) * 0.1
    )
    bench(DeviceCOO.from_host(coo), x, "XLA COO")
    bench(PaddedCOO.from_host(coo, check_symmetric=False), x, "PaddedCOO pallas")

    # dense joint for comparison (bipartite two-matmul equivalent)
    m = coo.to_scipy()[: 19539, 19539:]
    r = jnp.asarray(m.toarray(), dtype=jnp.bfloat16)

    from qrec_tpu.ops.spmm import DenseJoint

    dj = DenseJoint(r, jnp.asarray(np.ascontiguousarray(m.toarray().T), dtype=jnp.bfloat16), 19539)
    bench(dj, x, "DenseJoint bf16")


if __name__ == "__main__":
    main()
