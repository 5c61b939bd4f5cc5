"""Measure the per-epoch host-sync cost on the axon TPU tunnel:
run_training materializes float(loss) every epoch (bold-driver +
convergence + the reference's per-epoch loss line), which inserts a host
round-trip per epoch. Compares async-pipelined vs synced-every-epoch
LightGCN epochs to quantify what that round-trip costs in real runs.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import optax

from bench import build_problem
from qrec_tpu.models import get_model
from qrec_tpu.runtime.trainer import make_epoch_runner

REPS = 20


def main():
    conf, data = build_problem()
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

    # async: block only at the end
    t0 = time.perf_counter()
    for _ in range(REPS):
        rng, r1, r2 = jax.random.split(rng, 3)
        params, opt_state, loss = run_epoch(
            params, opt_state, spec.sampler(r1), r2, *cargs
        )
    jax.block_until_ready(loss)
    dt_async = (time.perf_counter() - t0) / REPS

    # synced: float(loss) every epoch, like run_training's loss line
    t0 = time.perf_counter()
    for _ in range(REPS):
        rng, r1, r2 = jax.random.split(rng, 3)
        params, opt_state, loss = run_epoch(
            params, opt_state, spec.sampler(r1), r2, *cargs
        )
        _ = float(loss)
    dt_sync = (time.perf_counter() - t0) / REPS

    print(f"async epoch: {dt_async * 1e3:.2f} ms")
    print(f"synced epoch: {dt_sync * 1e3:.2f} ms")
    print(f"per-epoch host-sync overhead: {(dt_sync - dt_async) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
