"""Similarity kernels (device-side) replacing util/qmath.py's per-pair dict
loops.

``edge_*`` functions compute similarities for an explicit edge list (u, v)
against the dense rating matrix in fixed-size chunks (lax.map) — used by the
social regularizers (SoReg's pearson+trust blend, LOCABAL's cosine). The
semantics replicate the reference's sparse-dict versions exactly:

* ``pearson_sp`` (qmath.py:58-76): means over each user's own rated items,
  sums over the common support, 1.0 when the denominator is zero but the
  supports overlap, else 0.
* ``cosine_sp`` (qmath.py:19-32): both numerator and denominators over the
  common support only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _chunked(fn, u_idx, v_idx, chunk: int):
    n = u_idx.shape[0]
    pad = (-n) % chunk
    up = jnp.concatenate([u_idx, jnp.zeros(pad, dtype=u_idx.dtype)])
    vp = jnp.concatenate([v_idx, jnp.zeros(pad, dtype=v_idx.dtype)])
    out = jax.lax.map(fn, (up.reshape(-1, chunk), vp.reshape(-1, chunk)))
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("chunk",))
def edge_pearson_sp(r_dense: jnp.ndarray, u_idx, v_idx, chunk: int = 512):
    """pearson_sp(row_u, row_v) for each edge; r_dense is |U|×|I|."""

    def one_chunk(args):
        u, v = args
        x1 = r_dense[u]  # (C, I)
        x2 = r_dense[v]
        m1 = (x1 > 0).astype(jnp.float32)
        m2 = (x2 > 0).astype(jnp.float32)
        common = m1 * m2
        mean1 = jnp.sum(x1, axis=1) / jnp.maximum(jnp.sum(m1, axis=1), 1)
        mean2 = jnp.sum(x2, axis=1) / jnp.maximum(jnp.sum(m2, axis=1), 1)
        c1 = (x1 - mean1[:, None]) * common
        c2 = (x2 - mean2[:, None]) * common
        total = jnp.sum(c1 * c2, axis=1)
        denom = jnp.sqrt(jnp.sum(c1**2, axis=1)) * jnp.sqrt(
            jnp.sum(c2**2, axis=1)
        )
        overlapped = jnp.sum(common, axis=1) > 0
        return jnp.where(
            denom > 0,
            total / jnp.maximum(denom, 1e-12),
            jnp.where(overlapped, 1.0, 0.0),
        )

    return _chunked(one_chunk, u_idx, v_idx, chunk)


@partial(jax.jit, static_argnames=("chunk",))
def edge_cosine_sp(r_dense: jnp.ndarray, u_idx, v_idx, chunk: int = 512):
    """cosine_sp(row_u, row_v) for each edge (common-support cosine)."""

    def one_chunk(args):
        u, v = args
        x1 = r_dense[u]
        x2 = r_dense[v]
        common = ((x1 > 0) & (x2 > 0)).astype(jnp.float32)
        total = jnp.sum(x1 * x2 * common, axis=1)
        denom = jnp.sqrt(jnp.sum(x1**2 * common, axis=1)) * jnp.sqrt(
            jnp.sum(x2**2 * common, axis=1)
        )
        return jnp.where(denom > 0, total / jnp.maximum(denom, 1e-12), 0.0)

    return _chunked(one_chunk, u_idx, v_idx, chunk)


def pairwise_pearson(rows: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Dense pearson_sp of every query row against every row (for KNN):
    returns (Q, N). Means over own support, sums over common support."""
    m_r = (rows > 0).astype(jnp.float32)
    m_q = (query > 0).astype(jnp.float32)
    mean_r = jnp.sum(rows, axis=1) / jnp.maximum(jnp.sum(m_r, axis=1), 1)
    mean_q = jnp.sum(query, axis=1) / jnp.maximum(jnp.sum(m_q, axis=1), 1)
    cr = (rows - mean_r[:, None]) * m_r
    cq = (query - mean_q[:, None]) * m_q
    # common-support sums via masked matmuls
    # (Q, N) over common support: cq is masked by m_q and cr by m_r, so the
    # product contributes only where both rated.
    num = cq @ cr.T
    d1 = (cq**2) @ m_r.T  # Σ over common of (x_q - m_q)^2
    d2 = m_q @ (cr**2).T
    denom = jnp.sqrt(d1) * jnp.sqrt(d2)
    overlapped = (m_q @ m_r.T) > 0
    return jnp.where(
        denom > 0,
        num / jnp.maximum(denom, 1e-12),
        jnp.where(overlapped, 1.0, 0.0),
    )


def pairwise_euclidean_sp(rows: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Reference euclidean_sp (qmath.py:34-43): 1 / Σ_common (x1² − x2²),
    0 on zero denominator. (Faithful to the reference's formula, signs and
    all.)"""
    m_r = (rows > 0).astype(jnp.float32)
    m_q = (query > 0).astype(jnp.float32)
    total = (query**2) @ m_r.T - m_q @ (rows**2).T
    return jnp.where(jnp.abs(total) > 1e-12, 1.0 / total, 0.0)


def pairwise_cosine_sp(rows: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
    """Common-support cosine of query rows vs all rows (Q, N)."""
    m_r = (rows > 0).astype(jnp.float32)
    m_q = (query > 0).astype(jnp.float32)
    num = query @ rows.T  # rows are zero outside support already
    d1 = (query**2) @ m_r.T
    d2 = m_q @ (rows**2).T
    denom = jnp.sqrt(d1) * jnp.sqrt(d2)
    return jnp.where(denom > 0, num / jnp.maximum(denom, 1e-12), 0.0)
