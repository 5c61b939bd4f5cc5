"""Profile LightGCN epoch components (sampler vs train scan) on the
default backend. Usage: python scripts/profile_lightgcn.py [batch_size]"""

import sys
import time

sys.path.insert(0, ".")

import jax
import optax

from bench import build_problem
from qrec_tpu.models import get_model
from qrec_tpu.runtime.trainer import make_epoch_runner


def main():
    overrides = {}
    if len(sys.argv) > 1:
        overrides["batch_size"] = sys.argv[1]
    conf, data = build_problem(overrides)
    model = get_model("LightGCN")(conf, data)
    spec = model.build()
    optimizer = optax.adam(model.lrate)
    run_epoch = make_epoch_runner(spec.loss_fn, optimizer)
    cargs = () if spec.consts is None else (spec.consts,)
    params = spec.params
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(0)

    r1, r2 = jax.random.split(rng)
    t0 = time.perf_counter()
    b = spec.sampler(r1)
    jax.block_until_ready(b)
    print(f"sampler compile+run: {time.perf_counter() - t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    params, opt_state, loss = run_epoch(params, opt_state, b, r2, *cargs)
    jax.block_until_ready(loss)
    print(f"epoch compile+run: {time.perf_counter() - t0:.1f} s", flush=True)

    t0 = time.perf_counter()
    for i in range(5):
        b = spec.sampler(jax.random.fold_in(rng, i))
        jax.block_until_ready(b)
    t_s = (time.perf_counter() - t0) / 5
    t0 = time.perf_counter()
    for i in range(5):
        params, opt_state, loss = run_epoch(
            params, opt_state, b, jax.random.fold_in(rng, i), *cargs
        )
    jax.block_until_ready(loss)
    t_t = (time.perf_counter() - t0) / 5
    n = len(data.training_data)
    print(f"sampler: {t_s * 1e3:.1f} ms, train scan: {t_t * 1e3:.1f} ms")
    print(
        f"epoch total {1e3 * (t_s + t_t):.1f} ms -> "
        f"{n / (t_s + t_t):,.0f} ex/s"
    )


if __name__ == "__main__":
    main()
