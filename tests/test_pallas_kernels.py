"""Pallas kernel correctness in interpret mode (CPU) vs XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qrec_tpu.ops import losses as L
from qrec_tpu.ops.pallas_kernels import (
    infonce_loss,
    masked_catalog_scores,
    masked_catalog_scores_xla,
)
from qrec_tpu.ops.sampling import pack_bitmask


def test_masked_catalog_scores_interpret():
    rng = np.random.RandomState(0)
    b, d, i = 8, 16, 8192  # i multiple of ITEM_TILE
    u = rng.randn(b, d).astype(np.float32)
    v = rng.randn(i, d).astype(np.float32)
    # random rated sets per user
    indptr = [0]
    indices = []
    for _ in range(b):
        row = np.sort(rng.choice(i, size=rng.randint(1, 40), replace=False))
        indices.extend(row)
        indptr.append(len(indices))
    mask = jnp.asarray(
        pack_bitmask(np.array(indptr), np.array(indices, dtype=np.int32), b, i)
    )
    got = masked_catalog_scores(
        jnp.asarray(u), jnp.asarray(v), mask, 0.0, interpret=True
    )
    expected = masked_catalog_scores_xla(jnp.asarray(u), jnp.asarray(v), mask, 0.0)
    assert np.allclose(np.asarray(got), np.asarray(expected), atol=1e-4)
    # sanity vs direct masking
    dense = u @ v.T
    for bi in range(b):
        rated = indices[indptr[bi] : indptr[bi + 1]]
        dense[bi, rated] = 0.0
    assert np.allclose(np.asarray(got), dense, atol=1e-4)


def test_infonce_interpret_matches_xla():
    rng = np.random.RandomState(1)
    b, d = 256, 32
    v1 = jnp.asarray(rng.randn(b, d).astype(np.float32))
    v2 = jnp.asarray(rng.randn(b, d).astype(np.float32))
    mask = jnp.asarray((rng.rand(b) > 0.2).astype(np.float32))
    got = infonce_loss(v1, v2, mask, 0.2, interpret=True)
    expected = L.masked_infonce(v1, v2, mask, 0.2)
    assert float(got) == pytest.approx(float(expected), rel=1e-4)


def test_infonce_interpret_multitile():
    rng = np.random.RandomState(2)
    b, d = 512, 16  # 2 row tiles
    v1 = jnp.asarray(rng.randn(b, d).astype(np.float32))
    v2 = jnp.asarray(rng.randn(b, d).astype(np.float32))
    mask = jnp.ones(b)
    got = infonce_loss(v1, v2, mask, 0.5, interpret=True)
    expected = L.masked_infonce(v1, v2, mask, 0.5)
    assert float(got) == pytest.approx(float(expected), rel=1e-4)


def test_infonce_gradients_match_xla():
    """The fused recompute backward (custom VJP) must match autodiff through
    the XLA masked_infonce — including masked rows and zero rows (the
    zero-row-safe normalization invariant)."""
    rng = np.random.RandomState(3)
    b, d = 512, 16
    v1 = rng.randn(b, d).astype(np.float32)
    v2 = rng.randn(b, d).astype(np.float32)
    v1[7] = 0.0  # zero row: must give a finite grad, not NaN
    mask = (rng.rand(b) > 0.25).astype(np.float32)
    mask[7] = 1.0
    v1, v2, mask = jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(mask)

    def f_pallas(a, b_):
        return infonce_loss(a, b_, mask, 0.2, interpret=True)

    def f_xla(a, b_):
        return L.masked_infonce(a, b_, mask, 0.2)

    g1p, g2p = jax.grad(f_pallas, argnums=(0, 1))(v1, v2)
    g1x, g2x = jax.grad(f_xla, argnums=(0, 1))(v1, v2)
    assert np.isfinite(np.asarray(g1p)).all()
    assert np.allclose(np.asarray(g1p), np.asarray(g1x), atol=2e-4), np.abs(
        np.asarray(g1p) - np.asarray(g1x)
    ).max()
    assert np.allclose(np.asarray(g2p), np.asarray(g2x), atol=2e-4)


def test_infonce_dispatch_pads_to_tile():
    """infonce_dispatch pads a non-tile-multiple batch with mask-0 rows —
    value and gradients identical to the unpadded XLA loss."""
    rng = np.random.RandomState(4)
    b, d = 300, 8  # not a multiple of ROW_TILE=256
    v1 = jnp.asarray(rng.randn(b, d).astype(np.float32))
    v2 = jnp.asarray(rng.randn(b, d).astype(np.float32))
    mask = jnp.asarray((rng.rand(b) > 0.3).astype(np.float32))

    got = L.infonce_dispatch(v1, v2, mask, 0.2, "pallas", True)
    expected = L.masked_infonce(v1, v2, mask, 0.2)
    assert float(got) == pytest.approx(float(expected), rel=1e-4)

    gp = jax.grad(
        lambda a: L.infonce_dispatch(a, v2, mask, 0.2, "pallas", True)
    )(v1)
    gx = jax.grad(lambda a: L.masked_infonce(a, v2, mask, 0.2))(v1)
    assert np.allclose(np.asarray(gp), np.asarray(gx), atol=2e-4)


def test_resolve_ssl_backend_policy(monkeypatch):
    from qrec_tpu.config import ModelConf
    from qrec_tpu.errors import ConfigError

    conf = ModelConf({"ssl.backend": "auto"})
    assert L.resolve_ssl_backend(conf, 4096) == ("xla", False)  # CPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert L.resolve_ssl_backend(conf, 4096) == ("pallas", False)
    assert L.resolve_ssl_backend(conf, 512) == ("xla", False)  # small batch
    # a mesh no longer downgrades: the fused kernel runs row-sharded
    assert L.resolve_ssl_backend(conf, 4096, mesh=object()) == ("pallas", False)
    conf2 = ModelConf({"ssl.backend": "pallas"})
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert L.resolve_ssl_backend(conf2, 64) == ("pallas", True)
    with pytest.raises(ConfigError):
        L.resolve_ssl_backend(ModelConf({"ssl.backend": "bogus"}), 64)


# ---------------------------------------------------------------------------
# bipartite dual-product kernel
# ---------------------------------------------------------------------------


def _dual_case(u, i, d, seed=0):
    from qrec_tpu.ops.pallas_kernels import dual_pad_sizes

    rng = np.random.RandomState(seed)
    up, ip = dual_pad_sizes(u, i)
    a = np.zeros((up, ip), dtype=np.float32)
    a[:u, :i] = (rng.rand(u, i) < 0.05) * rng.rand(u, i)
    a_p = jnp.asarray(a, dtype=jnp.bfloat16)
    xu = jnp.asarray(rng.randn(up, d).astype(np.float32)).astype(jnp.bfloat16)
    xi = jnp.asarray(rng.randn(ip, d).astype(np.float32)).astype(jnp.bfloat16)
    return a_p, xu, xi


@pytest.mark.parametrize("u,i,d", [(37, 211, 16), (600, 1100, 50)])
def test_bipartite_dual_matmul_interpret(u, i, d):
    from qrec_tpu.ops.pallas_kernels import (
        bipartite_dual_matmul,
        bipartite_dual_matmul_xla,
    )

    a_p, xu, xi = _dual_case(u, i, d)
    ou, oi = bipartite_dual_matmul(a_p, xu, xi, interpret=True)
    ru, ri = bipartite_dual_matmul_xla(a_p, xu, xi)
    np.testing.assert_allclose(np.asarray(ou), np.asarray(ru), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(ri), rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("u,i,d", [(37, 211, 16), (600, 1100, 50)])
def test_bipartite_dual_matmul_int8_interpret(u, i, d):
    """int8 adjacency tiles dequantize in-kernel to exactly the bf16
    result of the same quantized values (graph.dense.quant=int8 + dual)."""
    from qrec_tpu.ops.pallas_kernels import (
        bipartite_dual_matmul,
        bipartite_dual_matmul_xla,
        dual_pad_sizes,
    )

    rng = np.random.RandomState(7)
    up, ip = dual_pad_sizes(u, i, sublane=32)
    q = np.zeros((up, ip), dtype=np.int8)
    q[:u, :i] = rng.randint(0, 127, size=(u, i)).astype(np.int8)
    xu = jnp.asarray(rng.randn(up, d).astype(np.float32)).astype(jnp.bfloat16)
    xi = jnp.asarray(rng.randn(ip, d).astype(np.float32)).astype(jnp.bfloat16)
    ou, oi = bipartite_dual_matmul(jnp.asarray(q), xu, xi, interpret=True)
    a_bf = jnp.asarray(q, dtype=jnp.bfloat16)
    ru, ri = bipartite_dual_matmul_xla(a_bf, xu, xi)
    np.testing.assert_allclose(np.asarray(ou), np.asarray(ru), rtol=2e-3, atol=2e-2)
    np.testing.assert_allclose(np.asarray(oi), np.asarray(ri), rtol=2e-3, atol=2e-2)


def test_dual_joint_matmul_grad_matches_xla(tiny_data):
    """The symmetric-VJP dual path must match the two-matmul XLA path in
    both the propagation output and the gradients through it."""
    from qrec_tpu.ops.spmm import DenseJoint, lightgcn_propagate

    data = tiny_data
    adj_dual = DenseJoint.from_interactions(data, dual=True, dual_interpret=True)
    adj_xla = DenseJoint.from_interactions(data)
    n = adj_xla.num_rows
    rng = np.random.RandomState(1)
    e = jnp.asarray(rng.randn(n, 8).astype(np.float32))

    def loss(e, adj):
        out = lightgcn_propagate(adj, e, 2)
        return jnp.sum(out**2)

    l1, g1 = jax.value_and_grad(loss)(e, adj_dual)
    l2, g2 = jax.value_and_grad(loss)(e, adj_xla)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=5e-3, atol=5e-3)


def test_sharded_infonce_matches_single_device():
    """The mesh-sharded fused InfoNCE (rows over the 'data' axis) must match
    the single-device kernel and the XLA loss — value and both gradients —
    including the non-divisible-batch padding path through the dispatcher."""
    from qrec_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)  # data=4, model=2
    rng = np.random.RandomState(9)
    b, d = 300, 8  # pads to 304? no — to data-divisible tile multiple
    v1 = jnp.asarray(rng.randn(b, d).astype(np.float32))
    v2 = jnp.asarray(rng.randn(b, d).astype(np.float32))
    mask = jnp.asarray((rng.rand(b) > 0.3).astype(np.float32))

    got = L.infonce_dispatch(v1, v2, mask, 0.2, "pallas", True, mesh=mesh)
    expected = L.masked_infonce(v1, v2, mask, 0.2)
    assert float(got) == pytest.approx(float(expected), rel=1e-4)

    g1s = jax.grad(
        lambda a: L.infonce_dispatch(a, v2, mask, 0.2, "pallas", True, mesh=mesh)
    )(v1)
    g1x = jax.grad(lambda a: L.masked_infonce(a, v2, mask, 0.2))(v1)
    assert np.allclose(np.asarray(g1s), np.asarray(g1x), atol=2e-4)

    g2s = jax.grad(
        lambda a: L.infonce_dispatch(v1, a, mask, 0.2, "pallas", True, mesh=mesh)
    )(v2)
    g2x = jax.grad(lambda a: L.masked_infonce(v1, a, mask, 0.2))(v2)
    assert np.allclose(np.asarray(g2s), np.asarray(g2x), atol=2e-4)
