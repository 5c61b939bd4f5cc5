"""Graph construction + SpMM propagation tests (reference:
base/graphRecommender.py:10-29, LightGCN.py:17-33)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from qrec_tpu.data.graph import (
    COO,
    joint_normalized_adjacency,
    normalized_interaction,
)
from qrec_tpu.ops.spmm import (
    DeviceCOO,
    drop_edges,
    lightgcn_propagate,
    node_drop_vals,
    spmm,
)


def test_joint_adjacency_normalization(tiny_data):
    coo = joint_normalized_adjacency(tiny_data)
    n = tiny_data.num_users + tiny_data.num_items
    assert coo.shape == (n, n)
    a = coo.to_scipy().toarray()
    # symmetric
    assert np.allclose(a, a.T, atol=1e-6)
    # check one entry: value = 1/sqrt(deg_u * deg_i)
    u, i = int(tiny_data.train_u[0]), int(tiny_data.train_i[0])
    deg_u = tiny_data.u_indptr[u + 1] - tiny_data.u_indptr[u]
    deg_i = tiny_data.i_indptr[i + 1] - tiny_data.i_indptr[i]
    assert a[u, tiny_data.num_users + i] == pytest.approx(
        1 / np.sqrt(deg_u * deg_i), abs=1e-6
    )


def test_coo_row_sorted(tiny_data):
    coo = joint_normalized_adjacency(tiny_data)
    assert (np.diff(coo.rows) >= 0).all()


def test_spmm_matches_scipy(tiny_data):
    coo = normalized_interaction(tiny_data, "sym")
    dense = coo.to_scipy().toarray()
    x = np.random.RandomState(0).randn(tiny_data.num_items, 4).astype(np.float32)
    dev = DeviceCOO.from_host(coo)
    got = np.asarray(spmm(dev, jnp.asarray(x)))
    assert np.allclose(got, dense @ x, atol=1e-5)


def test_lightgcn_propagate_matches_dense(tiny_data):
    coo = joint_normalized_adjacency(tiny_data)
    a = coo.to_scipy().toarray()
    n = a.shape[0]
    e = np.random.RandomState(1).randn(n, 8).astype(np.float32)
    expected = (e + a @ e + a @ (a @ e)) / 3
    dev = DeviceCOO.from_host(coo)
    got = np.asarray(lightgcn_propagate(dev, jnp.asarray(e), 2))
    assert np.allclose(got, expected, atol=1e-4)


def test_dense_joint_matches_coo(tiny_data):
    from qrec_tpu.ops.spmm import DenseJoint

    coo = joint_normalized_adjacency(tiny_data)
    dev = DeviceCOO.from_host(coo)
    dense = DenseJoint.from_interactions(tiny_data)
    n = tiny_data.num_users + tiny_data.num_items
    e = np.random.RandomState(2).randn(n, 8).astype(np.float32)
    out_coo = np.asarray(spmm(dev, jnp.asarray(e)))
    out_dense = np.asarray(spmm(dense, jnp.asarray(e)))
    # bf16 adjacency: ~1% tolerance
    assert np.allclose(out_coo, out_dense, rtol=2e-2, atol=2e-2)
    p_coo = np.asarray(lightgcn_propagate(dev, jnp.asarray(e), 2))
    p_dense = np.asarray(lightgcn_propagate(dense, jnp.asarray(e), 2))
    assert np.allclose(p_coo, p_dense, rtol=3e-2, atol=3e-2)


def test_int8_dense_joint_matches_coo(tiny_data):
    """graph.dense.quant=int8: forward within quantization tolerance of the
    exact COO result, and the symmetric custom VJP's gradient IS the same
    operator applied to the cotangent."""
    from qrec_tpu.ops.spmm import DenseJoint

    coo = joint_normalized_adjacency(tiny_data)
    dev = DeviceCOO.from_host(coo)
    q = DenseJoint.from_interactions(tiny_data, quant=True)
    assert q.r_hat is None and q.q8 is not None
    n = tiny_data.num_users + tiny_data.num_items
    assert q.num_rows == n
    e = np.random.RandomState(2).randn(n, 8).astype(np.float32)
    out_coo = np.asarray(spmm(dev, jnp.asarray(e)))
    out_q = np.asarray(spmm(q, jnp.asarray(e)))
    # int8 per-row-scaled adjacency: ~2% tolerance class
    assert np.allclose(out_coo, out_q, rtol=4e-2, atol=4e-2)

    # gradient: d/dx sum(w * (M @ x)) = M @ w for the symmetric joint op
    w = np.random.RandomState(3).randn(n, 8).astype(np.float32)
    g = jax.grad(lambda x: jnp.sum(jnp.asarray(w) * spmm(q, x)))(
        jnp.asarray(e)
    )
    expect = np.asarray(spmm(q, jnp.asarray(w)))
    assert np.allclose(np.asarray(g), expect, rtol=1e-3, atol=1e-3)


def test_int8_quant_error_bounded(tiny_data):
    """Dequantized int8 weights sit within half a quantization step of the
    exact normalized adjacency, rowwise."""
    from qrec_tpu.ops.spmm import DenseJoint

    q = DenseJoint.from_interactions(tiny_data, quant=True)
    coo = joint_normalized_adjacency(tiny_data)
    exact = coo.to_scipy().toarray()[
        : tiny_data.num_users, tiny_data.num_users :
    ]
    deq = np.asarray(q.q8, dtype=np.float32) * np.asarray(q.row_scale)[:, None]
    step = np.asarray(q.row_scale)
    assert np.all(np.abs(deq - exact) <= 0.5001 * step[:, None])


def test_drop_edges_masks_values(tiny_data):
    coo = joint_normalized_adjacency(tiny_data)
    dev = DeviceCOO.from_host(coo)
    vals = drop_edges(jax.random.PRNGKey(0), dev, 0.5)
    v = np.asarray(vals)
    orig = np.asarray(dev.vals)
    assert ((v == 0) | (v == orig)).all()
    assert 0 < (v == 0).sum() < len(v)


def test_node_drop_consistency(tiny_data):
    coo = joint_normalized_adjacency(tiny_data)
    dev = DeviceCOO.from_host(coo)
    vals = np.asarray(node_drop_vals(jax.random.PRNGKey(4), dev, 0.4))
    rows, cols = np.asarray(dev.rows), np.asarray(dev.cols)
    # a node's edges must be dropped consistently: if edge (a,b) survives,
    # neither a nor b was dropped, so the reverse edge (b,a) also survives
    alive = {}
    for r, c, v in zip(rows, cols, vals):
        alive[(r, c)] = v != 0
    for (r, c), ok in alive.items():
        assert alive[(c, r)] == ok


# ---------------------------------------------------------------------------
# PaddedCOO (Pallas one-hot MXU scatter backend)
# ---------------------------------------------------------------------------


def _padded_from(tiny_data, **kw):
    from qrec_tpu.ops.spmm import PaddedCOO

    coo = joint_normalized_adjacency(tiny_data)
    return coo, PaddedCOO.from_host(
        coo, row_block=8, edge_tile=16, interpret=True, **kw
    )


def test_padded_coo_forward_matches_coo(tiny_data):
    coo, padded = _padded_from(tiny_data)
    dev = DeviceCOO.from_host(coo)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(coo.shape[0], 16).astype(np.float32))
    got = spmm(padded, x)
    want = spmm(dev, x)
    # pallas path gathers in bf16 → compare loosely
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-2)


def test_padded_coo_matches_xla_fallback(tiny_data):
    from qrec_tpu.ops.pallas_kernels import weighted_segment_matmul_xla

    coo, padded = _padded_from(tiny_data)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(coo.shape[0], 8).astype(np.float32))
    got = spmm(padded, x)
    want = weighted_segment_matmul_xla(
        x.astype(jnp.bfloat16)[padded.cols],
        padded.vals,
        padded.rows_local,
        padded.block_ids,
        padded.is_first,
        padded.row_block,
        padded.num_blocks,
    )[: padded.num_rows]
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-3)


def test_padded_coo_grad_x(tiny_data):
    coo, padded = _padded_from(tiny_data)
    dev = DeviceCOO.from_host(coo)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(coo.shape[0], 8).astype(np.float32))
    w = jnp.asarray(rng.randn(coo.shape[0], 8).astype(np.float32))

    def f(adj):
        return lambda xx: jnp.sum(spmm(adj, xx) * w)

    g_pallas = jax.grad(f(padded))(x)
    g_coo = jax.grad(f(dev))(x)
    assert np.allclose(np.asarray(g_pallas), np.asarray(g_coo), atol=2e-2)


def test_padded_coo_grad_vals_override(tiny_data):
    """Per-edge value override (dropout views): forward permutes into the
    padded layout; grad w.r.t. original-order vals matches the COO path."""
    coo, padded = _padded_from(tiny_data)
    dev = DeviceCOO.from_host(coo)
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(coo.shape[0], 8).astype(np.float32))
    w = jnp.asarray(rng.randn(coo.shape[0], 8).astype(np.float32))
    v0 = jnp.asarray(rng.rand(len(coo.vals)).astype(np.float32))

    def f(adj):
        return lambda vv: jnp.sum(spmm(adj, x, vv) * w)

    out_p = f(padded)(v0)
    out_c = f(dev)(v0)
    assert float(out_p) == pytest.approx(float(out_c), rel=5e-2, abs=1e-2)
    g_pallas = jax.grad(f(padded))(v0)
    g_coo = jax.grad(f(dev))(v0)
    assert np.allclose(np.asarray(g_pallas), np.asarray(g_coo), atol=2e-2)


def test_padded_coo_empty_row_blocks_get_a_tile():
    """A row block with no edges must still be visited by the kernel grid:
    Pallas output buffers are NOT zero-initialized, so an unvisited block
    would return garbage rows on real TPU. Every block gets >= 1 (all-pad)
    tile and its rows come back exactly zero."""
    from qrec_tpu.ops.spmm import PaddedCOO

    # 32 nodes, edges only within {0..7} and {24..31} → blocks 1,2 empty
    rows = np.array([0, 1, 24, 25], dtype=np.int32)
    cols = np.array([1, 0, 25, 24], dtype=np.int32)
    vals = np.ones(4, dtype=np.float32)
    coo = COO(rows, cols, vals, (32, 32))
    padded = PaddedCOO.from_host(coo, row_block=8, edge_tile=16, interpret=True)
    # all 4 blocks appear in the tile list, each with its is_first marker
    assert sorted(set(np.asarray(padded.block_ids))) == [0, 1, 2, 3]
    assert int(np.asarray(padded.is_first).sum()) == 4
    x = jnp.asarray(np.random.RandomState(0).randn(32, 8).astype(np.float32))
    out = np.asarray(spmm(padded, x))
    assert np.all(out[8:24] == 0.0)
    want = np.asarray(spmm(DeviceCOO.from_host(coo), x))
    assert np.allclose(out, want, atol=2e-2)


def test_padded_coo_rejects_unsorted_rows():
    from qrec_tpu.ops.spmm import PaddedCOO

    rows = np.array([1, 0], dtype=np.int32)
    cols = np.array([0, 1], dtype=np.int32)
    vals = np.ones(2, dtype=np.float32)
    coo = COO(rows, cols, vals, (2, 2))
    with pytest.raises(AssertionError):
        PaddedCOO.from_host(coo, row_block=8, edge_tile=16, check_symmetric=False)


def test_padded_coo_rejects_asymmetric():
    from qrec_tpu.ops.spmm import PaddedCOO

    rows = np.array([0, 1], dtype=np.int32)
    cols = np.array([1, 0], dtype=np.int32)
    vals = np.array([1.0, 2.0], dtype=np.float32)
    coo = COO(rows, cols, vals, (2, 2))
    with pytest.raises(ValueError):
        PaddedCOO.from_host(coo, row_block=8, edge_tile=16)


def test_joint_adj_backend_auto_prefers_pallas_on_tpu(tiny_conf, tiny_data, monkeypatch):
    """auto → DenseJoint under the dense budget; past it, pallas on TPU and
    plain COO elsewhere (models/base.py joint_adj)."""
    import qrec_tpu.ops.spmm as spmm_mod
    from qrec_tpu.models.graph import LightGCN
    from qrec_tpu.ops.spmm import DenseJoint, DeviceCOO, PaddedCOO

    tiny_conf.config["LightGCN"] = "-n_layer 2"

    m = LightGCN(tiny_conf, tiny_data)
    assert isinstance(m.joint_adj, DenseJoint)  # fits dense budget

    monkeypatch.setattr(spmm_mod, "DENSE_JOINT_LIMIT", 0)
    m = LightGCN(tiny_conf, tiny_data)
    assert isinstance(m.joint_adj, DeviceCOO)  # CPU: COO past the budget

    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # the 8 virtual devices + fake-TPU backend auto-enable the mesh, whose
    # policy is COO (the Pallas kernel is single-device) — pin single-chip
    tiny_conf.config["parallel.setup"] = "off"
    m = LightGCN(tiny_conf, tiny_data)
    assert isinstance(m.joint_adj, PaddedCOO)  # TPU single-chip: pallas

    # multi-chip mesh active → the row-shard-partitioned kernel (the round-3
    # upgrade: the MXU scatter win survives the mesh instead of downgrading)
    from qrec_tpu.ops.spmm import ShardedPaddedCOO

    tiny_conf.config["parallel.setup"] = "on -model 2"
    m = LightGCN(tiny_conf, tiny_data)
    assert isinstance(m.joint_adj, ShardedPaddedCOO)


def test_joint_adj_auto_respects_axon_embed_budget(
    tiny_conf, tiny_data, monkeypatch
):
    """Under the axon remote-compile tunnel, auto must not pick a dense
    adjacency whose embedded constant would 413 the compile request
    (models/base.py AXON_EMBED_LIMIT guard) — but ONLY for models that
    close over the adjacency. Consts-threading models (LightGCN et al.,
    threads_adj_consts=True) pass it as a jit argument, so the guard does
    not apply to them (round 5). Explicit graph.dense.limit re-enables
    dense for closure models too."""
    import jax

    import qrec_tpu.ops.spmm as spmm_mod
    from qrec_tpu.models.graph import LightGCN
    from qrec_tpu.ops.spmm import DenseJoint, PaddedCOO

    class ClosureLightGCN(LightGCN):
        threads_adj_consts = False

    tiny_conf.config["LightGCN"] = "-n_layer 2"
    tiny_conf.config["parallel.setup"] = "off"
    # the guard keys off the RESOLVED platform (config override aware, not
    # the raw env var — ADVICE r4); mock it to 'axon'
    import qrec_tpu.models.base as base_mod

    monkeypatch.setattr(base_mod, "resolved_platform", lambda: "axon")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    monkeypatch.setattr(spmm_mod, "AXON_EMBED_LIMIT", 0)
    m = ClosureLightGCN(tiny_conf, tiny_data)
    assert isinstance(m.joint_adj, PaddedCOO)  # guard excluded dense

    # consts-threading model: tables are jit args, guard does not apply
    m = LightGCN(tiny_conf, tiny_data)
    assert isinstance(m.joint_adj, DenseJoint)

    # explicit graph.dense.limit overrides the tunnel guard for closures
    tiny_conf.config["graph.dense.limit"] = str(10**9)
    m = ClosureLightGCN(tiny_conf, tiny_data)
    assert isinstance(m.joint_adj, DenseJoint)


def test_view_adjacency_pallas_matches_coo_on_subgraph_vals(tiny_data):
    """The SGL/BUIR view path: per-view values computed in the
    joint_bipartite_coo lexsorted order must permute correctly into the
    PaddedCOO layout (models/graph.py encode_view)."""
    import jax

    from qrec_tpu.data.graph import COO, joint_bipartite_coo
    from qrec_tpu.ops.spmm import PaddedCOO, renormalize_vals

    rows, cols, edge_ids, n = joint_bipartite_coo(tiny_data)
    n_edges = int(edge_ids.max()) + 1
    keep = jax.random.bernoulli(jax.random.PRNGKey(0), 0.7, (n_edges,))
    vals = renormalize_vals(
        jnp.asarray(rows), jnp.asarray(cols),
        keep[jnp.asarray(edge_ids)].astype(jnp.float32), n,
    )
    dev = DeviceCOO(
        jnp.asarray(rows), jnp.asarray(cols),
        jnp.ones(len(rows), jnp.float32), n, n,
    )
    padded = PaddedCOO.from_host(
        COO(rows, cols, np.ones(len(rows), np.float32), (n, n)),
        row_block=8, edge_tile=16, interpret=True, check_symmetric=False,
    )
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(n, 8).astype(np.float32))
    got = spmm(padded, x, vals)
    want = spmm(dev, x, vals)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-2)


def test_densemat_matches_coo():
    """DenseMat (bf16 MXU backend for auxiliary adjacencies) matches the
    sorted-COO segment-sum path within bf16 value precision."""
    import scipy.sparse as _sp

    from qrec_tpu.data.graph import COO as _COO
    from qrec_tpu.ops.spmm import DenseMat

    rng = np.random.RandomState(3)
    m = _sp.random(60, 45, density=0.1, random_state=rng, format="csr")
    x = jnp.asarray(rng.randn(45, 8).astype(np.float32))
    dense = spmm(DenseMat.from_scipy(m), x)
    coo = spmm(DeviceCOO.from_host(_COO.from_scipy(m.tocoo())), x)
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(coo), rtol=1e-2, atol=1e-2
    )


def test_factored_int8_exact_matches_coo(tiny_data):
    """graph.dense.quant=factored is EXACT: binary R in int8 with
    deg^-1/2 row/col scales — forward within bf16-activation tolerance of
    the f32 COO result (NO quantization error term), symmetric VJP."""
    from qrec_tpu.ops.spmm import DenseJoint

    coo = joint_normalized_adjacency(tiny_data)
    dev = DeviceCOO.from_host(coo)
    q = DenseJoint.from_interactions(tiny_data, quant="factored")
    assert q.q8 is not None and q.col_scale is not None
    n = tiny_data.num_users + tiny_data.num_items
    e = np.random.RandomState(2).randn(n, 8).astype(np.float32)
    out_coo = np.asarray(spmm(dev, jnp.asarray(e)))
    out_q = np.asarray(spmm(q, jnp.asarray(e)))
    # only bf16 activation rounding — tighter class than lossy int8
    assert np.allclose(out_coo, out_q, rtol=1e-2, atol=1e-2)
    w = np.random.RandomState(3).randn(n, 8).astype(np.float32)
    g = jax.grad(lambda x: jnp.sum(jnp.asarray(w) * spmm(q, x)))(jnp.asarray(e))
    expect = np.asarray(spmm(q, jnp.asarray(w)))
    assert np.allclose(np.asarray(g), expect, rtol=1e-3, atol=1e-3)


def test_factored_edge_drop_view_consistency(tiny_data):
    """The dense edge-dropout view must (a) produce EXACTLY transposed
    masked tables from the dual-orientation pair hash (no transpose op),
    (b) renormalize by kept degrees identically to the COO machinery
    (renormalize_vals) on the same kept-edge set, (c) keep ≈ (1-p) of the
    cells."""
    from qrec_tpu.data.graph import joint_bipartite_coo
    from qrec_tpu.ops.spmm import (
        DenseJoint,
        factored_edge_drop_view,
        factored_view_matmul,
        renormalize_vals,
    )

    q = DenseJoint.from_interactions(tiny_data, quant="factored")
    rng = jax.random.PRNGKey(5)
    q8v, q8v_t, su, si = factored_edge_drop_view(rng, q.q8, q.q8_t, 0.4)
    assert np.array_equal(np.asarray(q8v).T, np.asarray(q8v_t))
    kept = np.asarray(q8v).sum() / max(1, np.asarray(q.q8).sum())
    assert 0.3 < kept < 0.9  # ~0.6 expected on a tiny graph

    # COO cross-check: same kept edges → same renormalized propagation
    rows, cols, edge_ids, n_nodes = joint_bipartite_coo(tiny_data)
    nu = tiny_data.num_users
    mask = np.asarray(q8v) > 0
    keep_e = np.array(
        [
            mask[r, c - nu] if r < nu else mask[c, r - nu]
            for r, c in zip(rows, cols)
        ],
        dtype=np.float32,
    )
    vals = renormalize_vals(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(keep_e), n_nodes
    )
    dev = DeviceCOO(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(keep_e), n_nodes, n_nodes
    )
    e = np.random.RandomState(4).randn(n_nodes, 8).astype(np.float32)
    out_coo = np.asarray(spmm(dev, jnp.asarray(e), jnp.asarray(vals)))
    out_dense = np.asarray(factored_view_matmul(q8v, q8v_t, su, si, jnp.asarray(e)))
    assert np.allclose(out_coo, out_dense, rtol=1e-2, atol=1e-2)


def test_factored_node_drop_view_consistency(tiny_data):
    """Node dropout folds entirely into the renormalized scales: the masked
    propagation equals the COO subgraph (keep = ku[u]&ki[i]) renormalized
    propagation, with NO masked table materialized (same q8 objects)."""
    from qrec_tpu.data.graph import joint_bipartite_coo
    from qrec_tpu.ops.spmm import (
        DenseJoint,
        factored_node_drop_view,
        factored_view_matmul,
        renormalize_vals,
    )

    q = DenseJoint.from_interactions(tiny_data, quant="factored")
    rng = jax.random.PRNGKey(9)
    q8v, q8v_t, su, si = factored_node_drop_view(rng, q.q8, q.q8_t, 0.3)
    assert q8v is q.q8 and q8v_t is q.q8_t  # no materialization
    ku = np.asarray(
        jax.random.bernoulli(rng, 0.7, (tiny_data.num_users,))
    )
    ki = np.asarray(
        jax.random.bernoulli(
            jax.random.fold_in(rng, 1), 0.7, (tiny_data.num_items,)
        )
    )
    rows, cols, edge_ids, n_nodes = joint_bipartite_coo(tiny_data)
    nu = tiny_data.num_users
    keep_node = np.concatenate([ku, ki])
    keep_e = (keep_node[rows] & keep_node[cols]).astype(np.float32)
    vals = renormalize_vals(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(keep_e), n_nodes
    )
    dev = DeviceCOO(
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(keep_e), n_nodes, n_nodes
    )
    e = np.random.RandomState(4).randn(n_nodes, 8).astype(np.float32)
    out_coo = np.asarray(spmm(dev, jnp.asarray(e), jnp.asarray(vals)))
    out_dense = np.asarray(factored_view_matmul(q8v, q8v_t, su, si, jnp.asarray(e)))
    assert np.allclose(out_coo, out_dense, rtol=1e-2, atol=1e-2)
