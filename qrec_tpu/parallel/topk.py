"""Item-sharded full-catalog top-k via shard_map.

The catalog-sharding analogue of context parallelism (SURVEY §5): each
model-axis shard scores its slice of the item catalog on the MXU, takes a
local top-k, then an ``all_gather`` over the model axis merges the per-shard
candidates — k entries per shard cross the interconnect instead of the full
score row. Replaces the reference's per-user Python loop + numba heap
(base/recommender.py:143-160) at pod scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import MODEL_AXIS


def sharded_full_topk(
    mesh: Mesh,
    user_emb: jnp.ndarray,  # (B, d) replicated
    item_emb: jnp.ndarray,  # (I, d) row-sharded over MODEL_AXIS (I % shards == 0)
    k: int,
):
    """Return (scores, global item ids) of shape (B, k)."""

    def shard_fn(u, v):
        # u: (B, d) replicated; v: (I_local, d) local shard
        scores = jnp.dot(u, v.T, preferred_element_type=jnp.float32)
        s_loc, i_loc = jax.lax.top_k(scores, k)
        offset = jax.lax.axis_index(MODEL_AXIS) * v.shape[0]
        i_loc = i_loc + offset
        # gather the k candidates from every shard and merge locally
        s_all = jax.lax.all_gather(s_loc, MODEL_AXIS)  # (S, B, k)
        i_all = jax.lax.all_gather(i_loc, MODEL_AXIS)
        s_cat = jnp.transpose(s_all, (1, 0, 2)).reshape(u.shape[0], -1)
        i_cat = jnp.transpose(i_all, (1, 0, 2)).reshape(u.shape[0], -1)
        s_top, pos = jax.lax.top_k(s_cat, k)
        i_top = jnp.take_along_axis(i_cat, pos, axis=1)
        return s_top, i_top

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated post-all_gather merge
    )
    return jax.jit(fn)(user_emb, item_emb)
