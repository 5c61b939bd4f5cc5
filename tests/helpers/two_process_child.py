"""Child for test_parallel.test_two_process_cluster (VERDICT r4 #4).

Runs ONE sharded LightGCN training step + the sharded full-catalog top-k
over a REAL two-process jax.distributed CPU cluster (4 forced host devices
per process, gloo collectives) — or single-process when process_id < 0 —
and prints a JSON line of metrics for the parent to compare.
"""
import json
import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    )

    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
        if pid >= 0
        else "--xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    if pid >= 0:
        jax.distributed.initialize(
            f"localhost:{port}", num_processes=2, process_id=pid
        )
        assert jax.process_count() == 2
    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qrec_tpu.ops.spmm import DeviceCOO, lightgcn_propagate
    from qrec_tpu.parallel.mesh import make_mesh, shardings
    from qrec_tpu.parallel.topk import sharded_full_topk

    mesh = make_mesh()  # 8 global devices → ('data', 'model') = (4, 2)
    sh = shardings(mesh)

    # identical synthetic problem on every process (fixed seed)
    rng = np.random.RandomState(0)
    U, I, E, d = 32, 48, 300, 8
    u = rng.randint(0, U, E).astype(np.int32)
    i = rng.randint(0, I, E).astype(np.int32)
    pairs = np.unique(np.stack([u, i], 1), axis=0)
    u, i = pairs[:, 0], pairs[:, 1]
    n = U + I
    rows = np.concatenate([u, i + U])
    cols = np.concatenate([i + U, u])
    deg = np.bincount(rows, minlength=n).astype(np.float32)
    dinv = np.where(deg > 0, deg**-0.5, 0.0).astype(np.float32)
    vals = dinv[rows] * dinv[cols]
    order = np.lexsort((cols, rows))
    adj = DeviceCOO(
        jnp.asarray(rows[order].astype(np.int32)),
        jnp.asarray(cols[order].astype(np.int32)),
        jnp.asarray(vals[order]),
        n,
        n,
    )

    def make_global(arr, spec):
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            arr.shape, sharding, lambda idx: arr[idx]
        )

    params = {
        "user_emb": make_global(
            rng.randn(U, d).astype(np.float32) * 0.01, P()
        ),
        "item_emb": make_global(
            rng.randn(I, d).astype(np.float32) * 0.01, P()
        ),
    }
    bu = make_global(rng.randint(0, U, 64).astype(np.int32), P("data"))
    bi = make_global(rng.randint(0, I, 64).astype(np.int32), P("data"))
    bj = make_global(rng.randint(0, I, 64).astype(np.int32), P("data"))

    optimizer = optax.sgd(0.1)
    opt_state = optimizer.init(params)

    def loss_fn(params, bu, bi, bj):
        ego = jnp.concatenate([params["user_emb"], params["item_emb"]])
        out = lightgcn_propagate(adj, ego, 2)
        users, items = out[:U], out[U:]
        pos = jnp.sum(users[bu] * items[bi], axis=1)
        neg = jnp.sum(users[bu] * items[bj], axis=1)
        return -jnp.sum(jax.nn.log_sigmoid(pos - neg))

    @jax.jit
    def step(params, opt_state, bu, bi, bj):
        loss, grads = jax.value_and_grad(loss_fn)(params, bu, bi, bj)
        upd, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    params, opt_state, loss = step(params, opt_state, bu, bi, bj)

    # sharded full-catalog eval: items row-sharded over 'model'
    ego = jnp.concatenate([params["user_emb"], params["item_emb"]])
    prop = lightgcn_propagate(adj, ego, 2)
    u_emb = jax.device_put(prop[:U], sh.replicated)
    v_emb = jax.device_put(prop[U:], sh.embedding)
    ids, scores = jax.jit(
        lambda a, b: sharded_full_topk(mesh, a, b, 10)
    )(u_emb, v_emb)
    print(
        json.dumps(
            {
                "pid": pid,
                "nproc": jax.process_count(),
                "loss": float(loss),
                "param_norm": float(
                    jnp.linalg.norm(params["user_emb"])
                    + jnp.linalg.norm(params["item_emb"])
                ),
                "topk_checksum": int(np.asarray(ids).astype(np.int64).sum()),
                "topk_score_sum": float(np.asarray(scores).sum()),
            }
        )
    )


if __name__ == "__main__":
    main()
