"""Component-level profile of the LightGCN/lastfm epoch on the TPU
(VERDICT r3 task 2: publish the ms breakdown behind the 37 ms epoch).

Times, each with block_until_ready over repeated runs:
  - sampler dispatch           (on-device negative sampling, ops/sampling.py)
  - propagation forward        (n_layer DenseJoint spmm applications)
  - one training step          (loss fwd+bwd + adam update, batch 2000)
  - full epoch, host loop      (sampler + scan-over-batches, 1 dispatch/epoch)
  - chained epochs             (E dispatches, single block at the end)
  - chunked epochs             (sampler folded into ONE jit scanning E epochs)

Usage: JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache python scripts/profile_epoch.py
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


def timeit(fn, reps=20, warmup=2):
    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from bench import build_problem
    from qrec_tpu.models import get_model
    from qrec_tpu.runtime.trainer import make_epoch_runner

    conf, data = build_problem()
    model = get_model("LightGCN")(conf, data)
    spec = model.build()
    cargs = () if spec.consts is None else (spec.consts,)
    n_train = len(data.training_data)
    print(f"backend={jax.default_backend()} train={n_train} batch={model.batch_size}")

    rng = jax.random.PRNGKey(0)

    # 1. sampler alone
    t_samp = timeit(lambda: spec.sampler(rng))
    batches = spec.sampler(rng)
    nb = jax.tree_util.tree_leaves(batches)[0].shape[0]
    print(f"sampler (all {nb} batches):      {t_samp * 1e3:8.2f} ms")

    # 2. propagation forward only (the encoder: n_layer spmm applications)
    encode = model._encoder()
    prop = jax.jit(lambda p: encode(p))
    t_prop = timeit(lambda: prop(spec.params))
    print(f"encoder fwd (n_layer spmms):    {t_prop * 1e3:8.2f} ms  x{nb} = {t_prop * nb * 1e3:.1f} ms")

    # 3. one training step (loss fwd+bwd + adam)
    optimizer = optax.adam(model.lrate)
    opt_state = optimizer.init(spec.params)
    one_batch = jax.tree_util.tree_map(lambda x: x[0], batches)

    @jax.jit
    def one_step(params, opt_state, batch, r):
        loss, grads = jax.value_and_grad(spec.loss_fn)(params, batch, r, *cargs)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    t_step = timeit(lambda: one_step(spec.params, opt_state, one_batch, rng))
    print(f"1 step (fwd+bwd+adam):          {t_step * 1e3:8.2f} ms  x{nb} = {t_step * nb * 1e3:.1f} ms")

    # 4. full epoch as the training loop runs it (sampler + epoch dispatch)
    run_epoch = make_epoch_runner(spec.loss_fn, optimizer)
    params, ostate = spec.params, opt_state

    def host_epoch():
        r1, r2 = jax.random.split(rng)
        b = spec.sampler(r1)
        p, o, loss = run_epoch(params, ostate, b, r2, *cargs)
        return loss

    t_epoch = timeit(host_epoch, reps=20)
    print(f"epoch (host loop, 2 dispatch):  {t_epoch * 1e3:8.2f} ms  ({n_train / t_epoch:,.0f} ex/s)")

    # 5. chained: E epochs dispatched back-to-back, one block at the end
    E = 10

    def chained():
        p, o = params, ostate
        loss = None
        for i in range(E):
            r1, r2 = jax.random.split(jax.random.fold_in(rng, i))
            b = spec.sampler(r1)
            p, o, loss = run_epoch(p, o, b, r2, *cargs)
        return loss

    t_chain = timeit(chained, reps=3, warmup=1) / E
    print(f"epoch (chained x{E}):            {t_chain * 1e3:8.2f} ms  ({n_train / t_chain:,.0f} ex/s)")

    # 6. chunked: sampler inside ONE jit, lax.scan over E epochs
    @jax.jit
    def chunk(params, opt_state, rngs):
        def epoch_body(carry, er):
            p, o = carry
            b = spec.sampler(er[0])
            ks = jax.random.split(er[1], nb)

            def step(c, xs):
                p, o = c
                batch, sr = xs
                loss, grads = jax.value_and_grad(spec.loss_fn)(p, batch, sr, *cargs)
                upd, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, upd), o), loss

            (p, o), losses = jax.lax.scan(step, (p, o), (b, ks))
            return (p, o), jnp.sum(losses)

        (params, opt_state), losses = jax.lax.scan(
            epoch_body, (params, opt_state), rngs
        )
        return params, opt_state, losses

    rngs = jnp.stack([
        jnp.stack(jax.random.split(jax.random.fold_in(rng, i)))
        for i in range(E)
    ])
    t_chunk = timeit(lambda: chunk(params, ostate, rngs), reps=3, warmup=1) / E
    print(f"epoch (chunked scan x{E}):       {t_chunk * 1e3:8.2f} ms  ({n_train / t_chunk:,.0f} ex/s)")


if __name__ == "__main__":
    main()
