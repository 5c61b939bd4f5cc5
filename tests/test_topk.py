"""Full-catalog top-k eval tests vs a NumPy reference implementation of the
reference's evalRanking semantics (base/recommender.py:143-160)."""

import jax.numpy as jnp
import numpy as np
import pytest

from qrec_tpu.ops.topk import CatalogRanker, embedding_score_fn


def _reference_topk(data, U, V, k):
    """Replicates the reference loop: dense scores, zero rated, top-k."""
    ev = data.test_eval_arrays()
    out = {}
    for name, uid in zip(ev["names"], ev["uids"]):
        if uid >= 0:
            scores = V @ U[uid]
        else:
            scores = np.full(data.num_items, data.global_mean)
        if uid >= 0:
            scores[data.user_row_ids(int(uid))] = 0.0
        ids = np.argsort(-scores, kind="stable")[:k]
        out[name] = (ids, scores[ids])
    return out


def test_catalog_ranker_matches_reference(tiny_data):
    rng = np.random.RandomState(0)
    d = 8
    U = rng.randn(tiny_data.num_users, d).astype(np.float32)
    V = rng.randn(tiny_data.num_items, d).astype(np.float32)
    params = {"user_emb": jnp.asarray(U), "item_emb": jnp.asarray(V)}
    ranker = CatalogRanker(tiny_data, k=3, batch_size=4)
    ids, scores = ranker.topk(embedding_score_fn, params)
    expected = _reference_topk(tiny_data, U, V, 3)
    for b, name in enumerate(ranker.names):
        exp_ids, exp_scores = expected[name]
        # scores must match; ids may differ on exact ties only
        assert np.allclose(scores[b], exp_scores, atol=1e-5), name
        assert set(ids[b]) == set(exp_ids) or np.allclose(
            scores[b], exp_scores, atol=1e-5
        )


def test_rated_items_are_zeroed_not_excluded(tiny_data):
    # all-negative embeddings → zeroed rated items can legitimately rank top
    U = -np.abs(np.random.RandomState(1).randn(tiny_data.num_users, 4)).astype(
        np.float32
    )
    V = np.abs(np.random.RandomState(2).randn(tiny_data.num_items, 4)).astype(
        np.float32
    )
    params = {"user_emb": jnp.asarray(U), "item_emb": jnp.asarray(V)}
    ranker = CatalogRanker(tiny_data, k=2, batch_size=8)
    ids, scores = ranker.topk(embedding_score_fn, params)
    # every unmasked score is negative, so the top entries must be the
    # zeroed (rated) items — matching reference semantics exactly
    assert (scores >= -1e-6).any()


def test_topk_device_matches_host_path(tiny_data):
    rng = np.random.RandomState(3)
    params = {
        "user_emb": jnp.asarray(rng.randn(tiny_data.num_users, 4).astype(np.float32)),
        "item_emb": jnp.asarray(rng.randn(tiny_data.num_items, 4).astype(np.float32)),
    }
    ranker = CatalogRanker(tiny_data, k=3, batch_size=2)
    ids_h, scores_h = ranker.topk(embedding_score_fn, params)
    ids_d, scores_d = ranker.topk_device(embedding_score_fn, params)
    assert np.allclose(scores_h, np.asarray(scores_d), atol=1e-6)
    assert (ids_h == np.asarray(ids_d)).all()


def test_pallas_eval_backend_matches_xla(tiny_data):
    """eval.backend=pallas produces the same recommendations as the XLA
    path (interpret-mode kernel on CPU)."""
    from qrec_tpu.ops.sampling import pack_bitmask
    from qrec_tpu.ops.topk import pallas_catalog_topk

    rng = np.random.RandomState(7)
    d = 8
    U = jnp.asarray(rng.randn(tiny_data.num_users, d).astype(np.float32))
    V = jnp.asarray(rng.randn(tiny_data.num_items, d).astype(np.float32))
    bitmask = jnp.asarray(
        pack_bitmask(
            tiny_data.u_indptr, tiny_data.u_indices,
            tiny_data.num_users, tiny_data.num_items,
        )
    )
    ranker = CatalogRanker(tiny_data, k=3, batch_size=4)
    ids_x, scores_x = ranker.topk(
        embedding_score_fn, {"user_emb": U, "item_emb": V}
    )
    ids_p, scores_p = pallas_catalog_topk(
        U, V, ranker.uids, bitmask, tiny_data.global_mean, 3, batch_size=4,
        interpret=True,
    )
    assert np.allclose(scores_x, scores_p, atol=1e-5)
    assert (ids_x == ids_p).all()


def test_pallas_eval_mesh_sharded_matches_xla(tiny_data):
    """The fused masked-scorer eval with user blocks sharded over the
    8-device mesh must reproduce the XLA ranker exactly (interpret mode)."""
    from qrec_tpu.ops.sampling import pack_bitmask
    from qrec_tpu.ops.topk import pallas_catalog_topk
    from qrec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    rng = np.random.RandomState(8)
    d = 8
    U = jnp.asarray(rng.randn(tiny_data.num_users, d).astype(np.float32))
    V = jnp.asarray(rng.randn(tiny_data.num_items, d).astype(np.float32))
    bitmask = jnp.asarray(
        pack_bitmask(
            tiny_data.u_indptr, tiny_data.u_indices,
            tiny_data.num_users, tiny_data.num_items,
        )
    )
    ranker = CatalogRanker(tiny_data, k=3, batch_size=4)
    ids_x, scores_x = ranker.topk(
        embedding_score_fn, {"user_emb": U, "item_emb": V}
    )
    ids_s, scores_s = pallas_catalog_topk(
        U, V, ranker.uids, bitmask, tiny_data.global_mean, 3,
        batch_size=8, mesh=mesh, interpret=True,
    )
    assert np.allclose(scores_x, scores_s, atol=1e-5)
    assert (ids_x == ids_s).all()
