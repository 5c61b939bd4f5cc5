"""LightGCN epoch decomposition on TPU: async-pipelined timings for the
sampler alone, and the full epoch at n_layer = 0/1/2, to separate
sampler / BPR+Adam / per-layer propagation cost. Round-2 #8 evidence:
locates the HBM roofline of the DenseJoint propagation.
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


def time_epochs(model, spec, reps=REPS):
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
    for _ in range(reps):
        rng, r1, r2 = jax.random.split(rng, 3)
        params, opt_state, loss = run_epoch(
            params, opt_state, spec.sampler(r1), r2, *cargs
        )
    jax.block_until_ready(loss)
    return (time.perf_counter() - t0) / reps


def main():
    conf, data = build_problem()
    n = len(data.training_data)

    # sampler alone, async-chained
    model = get_model("LightGCN")(conf, data)
    spec = model.build()
    rng = jax.random.PRNGKey(0)
    b = spec.sampler(rng)
    jax.block_until_ready(b)
    t0 = time.perf_counter()
    for i in range(REPS):
        b = spec.sampler(jax.random.fold_in(rng, i))
    jax.block_until_ready(b)
    t_s = (time.perf_counter() - t0) / REPS
    print(f"sampler alone: {t_s * 1e3:.2f} ms", flush=True)

    for layers in (0, 1, 2):
        conf_l, _ = conf, None
        conf_l.config["LightGCN"] = f"-n_layer {layers}"
        m = get_model("LightGCN")(conf_l, data)
        s = m.build()
        dt = time_epochs(m, s)
        print(
            f"n_layer={layers}: epoch {dt * 1e3:.2f} ms "
            f"({n / dt:,.0f} ex/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
