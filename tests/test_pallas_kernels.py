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
