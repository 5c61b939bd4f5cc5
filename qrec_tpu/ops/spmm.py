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


def spmm(adj: DeviceCOO, x: jnp.ndarray, vals: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """``A @ x`` for row-sorted COO ``A`` and dense ``x`` (N_cols, d).

    ``vals`` overrides the stored edge weights (used for on-device edge
    dropout / augmented views without rebuilding index arrays).
    """
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
    adj: DeviceCOO,
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
