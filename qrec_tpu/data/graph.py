"""Host-side graph construction (one-time, scipy) → device COO layouts.

Mirrors the reference's adjacency builders: the joint (U+I)×(U+I) interaction
adjacency with symmetric normalization D^-1/2 A D^-1/2
(base/graphRecommender.py:10-29) and the row/sym-normalized user-item rating
matrices (base/graphRecommender.py:41-61). Construction stays on host — it is
a one-time cost — but the output is a row-sorted COO triple ready for the
device segment-sum/Pallas SpMM propagation path (qrec_tpu/ops/spmm.py).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import scipy.sparse as sp


class COO(NamedTuple):
    """Row-sorted COO sparse matrix for device SpMM."""

    rows: np.ndarray  # (nnz,) int32, sorted ascending
    cols: np.ndarray  # (nnz,) int32
    vals: np.ndarray  # (nnz,) float32
    shape: tuple

    @classmethod
    def from_scipy(cls, m: sp.spmatrix) -> "COO":
        coo = m.tocoo()
        order = np.lexsort((coo.col, coo.row))
        return cls(
            coo.row[order].astype(np.int32),
            coo.col[order].astype(np.int32),
            coo.data[order].astype(np.float32),
            m.shape,
        )

    @property
    def nnz(self) -> int:
        return len(self.rows)

    def transpose(self) -> "COO":
        return COO.from_scipy(self.to_scipy().T)

    def to_scipy(self) -> sp.csr_matrix:
        return sp.csr_matrix(
            (self.vals, (self.rows, self.cols)), shape=self.shape
        )


def joint_bipartite_coo(data):
    """Unnormalized joint adjacency structure with undirected-edge ids.

    Returns ``(rows, cols, edge_ids, n_nodes)``: both directions of every
    (user, item) interaction, row-sorted, where ``edge_ids[k]`` indexes the
    originating interaction (0..E-1). A Bernoulli keep-mask over interactions
    indexed through ``edge_ids`` drops both directions consistently — the
    device-side replacement for SGL's per-epoch host subgraph rebuilds
    (SGL.py:113-155), with renormalization done on device
    (qrec_tpu.ops.spmm.renormalize_vals).
    """
    u = data.train_u[data.csr_sel]
    i = data.train_i[data.csr_sel]
    e = len(u)
    rows = np.concatenate([u, i + data.num_users]).astype(np.int32)
    cols = np.concatenate([i + data.num_users, u]).astype(np.int32)
    edge_ids = np.concatenate([np.arange(e), np.arange(e)]).astype(np.int32)
    order = np.lexsort((cols, rows))
    n = data.num_users + data.num_items
    return rows[order], cols[order], edge_ids[order], n


def interaction_matrix(data, binary: bool = False) -> sp.csr_matrix:
    """|U|×|I| rating matrix as scipy CSR."""
    vals = np.ones_like(data.train_r) if binary else data.train_r
    return sp.csr_matrix(
        (vals, (data.train_u, data.train_i)),
        shape=(data.num_users, data.num_items),
    )


def joint_normalized_adjacency(data, self_loop: bool = False) -> COO:
    """Symmetric-normalized joint adjacency ``D^-1/2 [[0, R], [R^T, 0]] D^-1/2``
    over U+I nodes (base/graphRecommender.py:10-29; ratings treated binary)."""
    n = data.num_users + data.num_items
    r = interaction_matrix(data, binary=True)
    a = sp.lil_matrix((n, n), dtype=np.float32)
    a[: data.num_users, data.num_users :] = r
    a[data.num_users :, : data.num_users] = r.T
    a = a.tocsr()
    if self_loop:
        a = a + sp.eye(n, dtype=np.float32, format="csr")
    deg = np.asarray(a.sum(axis=1)).ravel()
    d_inv_sqrt = np.power(deg, -0.5, where=deg > 0, out=np.zeros_like(deg))
    d_mat = sp.diags(d_inv_sqrt)
    return COO.from_scipy(d_mat @ a @ d_mat)


def normalized_interaction(data, mode: str = "sym") -> COO:
    """Normalized |U|×|I| rating matrix (base/graphRecommender.py:41-61).

    ``mode='sym'``: D_u^-1/2 R D_i^-1/2 ; ``mode='row'``: D_u^-1 R.
    Ratings treated binary, matching the reference's buildSparseRatingMatrix.
    """
    r = interaction_matrix(data, binary=True)
    deg_u = np.asarray(r.sum(axis=1)).ravel()
    deg_i = np.asarray(r.sum(axis=0)).ravel()
    if mode == "sym":
        du = sp.diags(
            np.power(deg_u, -0.5, where=deg_u > 0, out=np.zeros_like(deg_u))
        )
        di = sp.diags(
            np.power(deg_i, -0.5, where=deg_i > 0, out=np.zeros_like(deg_i))
        )
        return COO.from_scipy(du @ r @ di)
    if mode == "row":
        du = sp.diags(
            np.power(deg_u, -1.0, where=deg_u > 0, out=np.zeros_like(deg_u))
        )
        return COO.from_scipy(du @ r)
    raise ValueError(f"unknown normalization mode {mode!r}")


def normalized_social_adjacency(social, mode: str = "row") -> COO:
    """Normalized U×U trust adjacency for social diffusion models
    (e.g. SocialMF's sparse social matmul, model/rating/SocialMF.py:69-90)."""
    s = social.scipy_adjacency()
    deg = np.asarray(s.sum(axis=1)).ravel()
    if mode == "row":
        d = sp.diags(np.power(deg, -1.0, where=deg > 0, out=np.zeros_like(deg)))
        return COO.from_scipy(d @ s)
    if mode == "sym":
        d = sp.diags(np.power(deg, -0.5, where=deg > 0, out=np.zeros_like(deg)))
        return COO.from_scipy(d @ s @ d)
    raise ValueError(f"unknown normalization mode {mode!r}")
