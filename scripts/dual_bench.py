"""Measure the single-pass dual-product kernel on TPU.

1. Per-application: pallas dual kernel vs the two-matmul XLA path at
   lastfm scale (fwd only and fwd+bwd through the custom VJP).
2. LightGCN steady-state epoch with graph.dense.dual=on vs =off.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench import build_problem
from qrec_tpu.models import get_model
from qrec_tpu.runtime.trainer import make_epoch_runner


def timeit(fn, *args, n=30):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n


def per_application():
    from qrec_tpu.ops.spmm import DenseJoint, _dual_joint_matmul, _dense_joint_matmul

    conf, data = build_problem()
    adj = DenseJoint.from_interactions(data, dual=True)
    n = adj.num_rows
    nu, ni = adj.num_users, adj.r_hat.shape[1]
    x = jnp.asarray(np.random.RandomState(0).randn(n, 50).astype(np.float32))

    f_xla = jax.jit(lambda x: _dense_joint_matmul(adj, x))
    f_dual = jax.jit(lambda x: _dual_joint_matmul(adj.r_hat_p, x, nu, ni, False))
    print(f"fwd xla 2-matmul: {timeit(f_xla, x) * 1e3:.2f} ms", flush=True)
    print(f"fwd pallas dual:  {timeit(f_dual, x) * 1e3:.2f} ms", flush=True)
    # numerics
    a, b = f_xla(x), f_dual(x)
    err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-9))
    print(f"fwd rel max err: {err:.2e}", flush=True)

    g_xla = jax.jit(jax.grad(lambda x: jnp.sum(_dense_joint_matmul(adj, x) ** 2)))
    g_dual = jax.jit(
        jax.grad(lambda x: jnp.sum(_dual_joint_matmul(adj.r_hat_p, x, nu, ni, False) ** 2))
    )
    print(f"fwd+bwd xla 2-matmul: {timeit(g_xla, x) * 1e3:.2f} ms", flush=True)
    print(f"fwd+bwd pallas dual:  {timeit(g_dual, x) * 1e3:.2f} ms", flush=True)
    ga, gb = g_xla(x), g_dual(x)
    gerr = float(jnp.max(jnp.abs(ga - gb)) / (jnp.max(jnp.abs(ga)) + 1e-9))
    print(f"grad rel max err: {gerr:.2e}", flush=True)


def epoch_times():
    for dual in ("off", "auto"):
        conf, data = build_problem({"graph.dense.dual": dual})
        model = get_model("LightGCN")(conf, data)
        spec = model.build()
        optimizer = optax.adam(model.lrate)
        run_epoch = make_epoch_runner(spec.loss_fn, optimizer)
        cargs = () if spec.consts is None else (spec.consts,)
        params = spec.params
        opt_state = optimizer.init(params)
        rng = jax.random.PRNGKey(0)
        rng, r1, r2 = jax.random.split(rng, 3)
        params, opt_state, loss = run_epoch(params, opt_state, spec.sampler(r1), r2, *cargs)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            rng, r1, r2 = jax.random.split(rng, 3)
            params, opt_state, loss = run_epoch(
                params, opt_state, spec.sampler(r1), r2, *cargs
            )
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / reps
        n = len(data.training_data)
        print(
            f"graph.dense.dual={dual}: epoch {dt * 1e3:.2f} ms "
            f"({n / dt:,.0f} ex/s) final_loss={float(loss):.2f}",
            flush=True,
        )


if __name__ == "__main__":
    per_application()
    epoch_times()
