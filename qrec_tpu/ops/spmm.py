"""Device-side sparse propagation (SpMM) for graph recommenders.

Replaces ``tf.sparse_tensor_dense_matmul`` over host-built SparseTensors
(base/graphRecommender.py:31-39, model/ranking/LightGCN.py:17-33) with
XLA-native gather + sorted segment-sum. Rows must be sorted ascending (the
:class:`qrec_tpu.data.graph.COO` contract) so XLA can use the
``indices_are_sorted`` fast path.

Edge-dropout is expressed as *masked edge weights* regenerated from a PRNG
key on device, replacing the reference's per-epoch host-side scipy graph
rebuilds (SGL.py:233-250).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class DeviceCOO(NamedTuple):
    rows: jnp.ndarray  # (nnz,) int32 sorted
    cols: jnp.ndarray  # (nnz,) int32
    vals: jnp.ndarray  # (nnz,) float32
    num_rows: int
    num_cols: int

    @classmethod
    def from_host(cls, coo) -> "DeviceCOO":
        return cls(
            jnp.asarray(coo.rows),
            jnp.asarray(coo.cols),
            jnp.asarray(coo.vals),
            int(coo.shape[0]),
            int(coo.shape[1]),
        )


class DenseJoint(NamedTuple):
    """Dense-bipartite backend for the joint (U+I)×(U+I) adjacency.

    TPU random gather/scatter runs at ~2% of HBM bandwidth, so for
    benchmark-scale graphs the MXU wins outright: the joint adjacency is
    block-off-diagonal, so ``Â @ [E_u; E_i]`` is exactly two dense matmuls
    ``R̂ @ E_i`` and ``R̂ᵀ @ E_u``. Values are stored bf16 (accumulation in
    f32) — ~0.4% relative error on edge weights, immaterial to training.

    Used automatically by GraphRecommender.joint_adj when
    ``num_users × num_items`` fits the dense budget; models needing per-edge
    masked values (SGL/BUIR/SEPT views) stay on the COO path.
    """

    r_hat: jnp.ndarray  # (U, I), bf16
    r_hat_t: jnp.ndarray  # (I, U), bf16
    num_users: int

    @property
    def num_rows(self) -> int:
        return self.r_hat.shape[0] + self.r_hat.shape[1]

    @classmethod
    def from_interactions(cls, data) -> "DenseJoint":
        """Build D^-1/2 R D^-1/2 densely (binary interactions, matching
        base/graphRecommender.py:10-29)."""
        import numpy as np

        deg_u = np.maximum(np.diff(data.u_indptr), 1).astype(np.float32)
        deg_i = np.maximum(np.diff(data.i_indptr), 1).astype(np.float32)
        u = data.train_u[data.csr_sel]
        i = data.train_i[data.csr_sel]
        vals = 1.0 / np.sqrt(deg_u[u]) / np.sqrt(deg_i[i])
        r = np.zeros((data.num_users, data.num_items), dtype=np.float32)
        r[u, i] = vals
        r_d = jnp.asarray(r, dtype=jnp.bfloat16)
        return cls(r_d, r_d.T, data.num_users)


# entry budget for the dense-bipartite path (~1.2 GB at bf16)
DENSE_JOINT_LIMIT = 600_000_000


def _dense_joint_matmul(adj: DenseJoint, x: jnp.ndarray) -> jnp.ndarray:
    nu = adj.num_users
    xu = x[:nu].astype(jnp.bfloat16)
    xi = x[nu:].astype(jnp.bfloat16)
    out_u = jnp.dot(adj.r_hat, xi, preferred_element_type=jnp.float32)
    out_i = jnp.dot(adj.r_hat_t, xu, preferred_element_type=jnp.float32)
    return jnp.concatenate([out_u, out_i])


def spmm(adj, x: jnp.ndarray, vals: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``A @ x`` for a row-sorted COO or DenseJoint ``A`` and dense ``x``.

    ``vals`` overrides the stored edge weights (used for on-device edge
    dropout / augmented views without rebuilding index arrays) — COO only.
    """
    if isinstance(adj, DenseJoint):
        assert vals is None, "per-edge values need the COO path"
        return _dense_joint_matmul(adj, x)
    v = adj.vals if vals is None else vals
    gathered = x[adj.cols] * v[:, None]
    return jax.ops.segment_sum(
        gathered,
        adj.rows,
        num_segments=adj.num_rows,
        indices_are_sorted=True,
    )


def drop_edges(
    rng: jax.Array, adj: DeviceCOO, drop_rate: float, rescale: bool = False
) -> jnp.ndarray:
    """Edge-dropout as a masked value vector (keep prob = 1 - drop_rate).

    Returns new ``vals``; pass to :func:`spmm`. With ``rescale`` the kept
    edges are scaled by 1/(1-p) (inverted dropout).
    """
    keep = jax.random.bernoulli(rng, 1.0 - drop_rate, (adj.vals.shape[0],))
    vals = jnp.where(keep, adj.vals, 0.0)
    if rescale and drop_rate > 0:
        vals = vals / (1.0 - drop_rate)
    return vals


def lightgcn_propagate(
    adj,
    embeddings: jnp.ndarray,  # (U+I, d)
    num_layers: int,
    vals: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """K-layer linear propagation ``E ← ÂE`` with layer-mean readout
    (model/ranking/LightGCN.py:17-33)."""
    acc = embeddings
    e = embeddings
    for _ in range(num_layers):
        e = spmm(adj, e, vals)
        acc = acc + e
    return acc / (num_layers + 1)


def renormalize_vals(
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    keep: jnp.ndarray,  # (nnz,) float 0/1 — symmetric keep mask
    num_nodes: int,
) -> jnp.ndarray:
    """Symmetric normalization D^-1/2 A D^-1/2 of a kept subgraph, on device.

    Matches the reference's renormalization of the *dropped* subgraph
    (SGL.py:146-155) without any host round-trip: degrees are recomputed by
    segment-sum over the keep mask.
    """
    deg = jax.ops.segment_sum(
        keep, rows, num_segments=num_nodes, indices_are_sorted=True
    )
    d_inv = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    return keep * d_inv[rows] * d_inv[cols]


def subgraph_vals(
    rng: jax.Array,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    edge_ids: jnp.ndarray,
    num_edges: int,
    num_nodes: int,
    num_users: int,
    drop_rate: float,
    aug_type: int,
) -> jnp.ndarray:
    """Renormalized edge values of an augmented-view subgraph.

    ``aug_type`` 0 = node dropout, 1/2 = edge dropout (SGL.py:113-141);
    for random-walk views (type 2) call once per layer with fresh keys.
    """
    if aug_type == 0:
        ku = jax.random.bernoulli(rng, 1.0 - drop_rate, (num_users,))
        ki = jax.random.bernoulli(
            jax.random.fold_in(rng, 1), 1.0 - drop_rate, (num_nodes - num_users,)
        )
        keep_node = jnp.concatenate([ku, ki])
        keep = (keep_node[rows] & keep_node[cols]).astype(jnp.float32)
    else:
        keep_e = jax.random.bernoulli(rng, 1.0 - drop_rate, (num_edges,))
        keep = keep_e[edge_ids].astype(jnp.float32)
    return renormalize_vals(rows, cols, keep, num_nodes)


def node_drop_vals(
    rng: jax.Array, adj: DeviceCOO, drop_rate: float
) -> jnp.ndarray:
    """Node-dropout view: drop all edges incident to sampled nodes
    (SGL aug type 0 — SGL.py:113-126 — expressed as masked edge weights)."""
    n = max(adj.num_rows, adj.num_cols)
    keep_node = jax.random.bernoulli(rng, 1.0 - drop_rate, (n,))
    keep = keep_node[adj.rows] & keep_node[adj.cols]
    return jnp.where(keep, adj.vals, 0.0)
