"""Sharding-layer tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrec_tpu.parallel.mesh import make_mesh, shardings
from qrec_tpu.parallel.topk import sharded_full_topk


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = make_mesh(1)
    assert mesh1.shape == {"data": 1, "model": 1}
    mesh4 = make_mesh(4, model_parallel=4)
    assert mesh4.shape == {"data": 1, "model": 4}


def test_sharded_topk_matches_dense():
    mesh = make_mesh(8)
    rng = np.random.RandomState(0)
    b, i, d, k = 16, 64, 8, 5  # i divisible by model axis (2)
    u = rng.randn(b, d).astype(np.float32)
    v = rng.randn(i, d).astype(np.float32)
    sh = shardings(mesh)
    u_dev = jax.device_put(jnp.asarray(u), sh.replicated)
    v_dev = jax.device_put(jnp.asarray(v), sh.embedding)
    scores, ids = sharded_full_topk(mesh, u_dev, v_dev, k)
    dense = u @ v.T
    exp_ids = np.argsort(-dense, axis=1)[:, :k]
    exp_scores = np.take_along_axis(dense, exp_ids, axis=1)
    assert np.allclose(np.asarray(scores), exp_scores, atol=1e-5)
    assert (np.asarray(ids) == exp_ids).all()


def test_sharded_embedding_training_step_matches_single_device():
    """A jitted Adam step over sharded embeddings must equal the unsharded
    result (GSPMD inserts the collectives; numerics must not change)."""
    import optax

    rng = np.random.RandomState(1)
    nu, ni, d, batch = 32, 64, 8, 16
    params0 = {
        "user_emb": jnp.asarray(rng.randn(nu, d).astype(np.float32)),
        "item_emb": jnp.asarray(rng.randn(ni, d).astype(np.float32)),
    }
    bu = jnp.asarray(rng.randint(0, nu, batch).astype(np.int32))
    bi = jnp.asarray(rng.randint(0, ni, batch).astype(np.int32))
    bj = jnp.asarray(rng.randint(0, ni, batch).astype(np.int32))
    optimizer = optax.adam(1e-2)

    def loss_fn(params, bu, bi, bj):
        pu = params["user_emb"][bu]
        qi = params["item_emb"][bi]
        qj = params["item_emb"][bj]
        y = jnp.sum(pu * qi, axis=1) - jnp.sum(pu * qj, axis=1)
        return -jnp.sum(jnp.log(jax.nn.sigmoid(y) + 1e-7))

    @jax.jit
    def step(params, opt_state, bu, bi, bj):
        loss, grads = jax.value_and_grad(loss_fn)(params, bu, bi, bj)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    # single device
    p1, l1 = step(params0, optimizer.init(params0), bu, bi, bj)

    # sharded
    mesh = make_mesh(8)
    sh = shardings(mesh)
    params_sh = sh.params(params0)
    bu_s = jax.device_put(bu, sh.batch)
    bi_s = jax.device_put(bi, sh.batch)
    bj_s = jax.device_put(bj, sh.batch)
    p2, l2 = step(params_sh, optimizer.init(params_sh), bu_s, bi_s, bj_s)

    assert np.allclose(float(l1), float(l2), rtol=1e-5)
    for k in p1:
        assert np.allclose(np.asarray(p1[k]), np.asarray(p2[k]), atol=1e-5), k


def test_sharded_training_end_to_end(tmp_path):
    """parallel.setup=on trains BPR over the 8-device mesh end-to-end."""
    from qrec_tpu import ModelConf, QRec
    from qrec_tpu.ops.metrics import parse_measure

    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            lines.append(f"u{u} i{i} 1\n")
    p = tmp_path / "ratings.txt"
    p.write_text("".join(lines))
    conf = ModelConf(
        {
            "ratings": str(p),
            "ratings.setup": "-columns 0 1 2",
            "model.name": "BPR",
            "evaluation.setup": "-ap 0.2",
            "item.ranking": "on -topN 10",
            "num.factors": "16",
            "num.max.epoch": "30",
            "batch_size": "64",
            "learnRate": "-init 0.05 -max 1",
            "reg.lambda": "-u 0.01 -i 0.01 -b 0.1 -s 0.1",
            "output.setup": "off -dir ./results/",
            "parallel.setup": "on -model 2",
            "seed": "7",
        }
    )
    rec = QRec(conf, seed=3)
    measure = rec.execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > 0.5, parsed
    assert rec.model.mesh is not None
    assert rec.model.mesh.shape == {"data": 4, "model": 2}
