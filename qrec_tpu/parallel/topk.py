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


def sharded_masked_topk(
    mesh: Mesh,
    user_block: jnp.ndarray,  # (B, d) replicated — test-user embedding rows
    item_emb: jnp.ndarray,  # (I_pad, d) row-sharded over MODEL_AXIS
    rated_pad: jnp.ndarray,  # (B, D) int32 GLOBAL rated item ids (pad = >= I)
    unseen: jnp.ndarray,  # (B,) bool — user absent from training
    global_mean: float,  # python float (closed over as a kernel constant)
    num_items: int,  # true catalog size (I_pad may be padded up)
    k: int,
    mask_value: float = 0.0,
):
    """Item-sharded full-catalog top-k with the evaluator's exact semantics
    (ops/topk._topk_batch): unseen users score ``global_mean`` everywhere,
    train-rated items are masked to ``mask_value`` BEFORE the top-k, and
    padding items (ids >= num_items) never win. Each shard masks its slice
    locally (rated ids shifted by the shard offset; out-of-slice ids drop),
    takes a local top-k, and an all_gather merges k candidates per shard —
    k rows cross the interconnect instead of the full score row. Ties break
    by ascending global item id, matching single-device ``lax.top_k``.

    Returns (ids, scores) of shape (B, k), replicated.
    """

    def shard_fn(u, v, rated, uns):
        i_loc = v.shape[0]
        scores = jnp.dot(u, v.T, preferred_element_type=jnp.float32)
        scores = jnp.where(
            uns[:, None], jnp.full_like(scores, global_mean), scores
        )
        offset = jax.lax.axis_index(MODEL_AXIS) * i_loc
        local_ids = rated - offset
        # scatter mode='drop' only drops too-LARGE indices — negatives wrap
        # (numpy semantics) — so ids left of this slice must be clamped OOB
        local_ids = jnp.where(local_ids < 0, i_loc, local_ids)
        b = scores.shape[0]
        rows = jnp.repeat(jnp.arange(b)[:, None], rated.shape[1], axis=1)
        scores = scores.at[rows, local_ids].set(mask_value, mode="drop")
        gids = offset + jnp.arange(i_loc)
        scores = jnp.where(gids[None, :] < num_items, scores, -jnp.inf)
        kk = min(k, i_loc)
        s_loc, idx_loc = jax.lax.top_k(scores, kk)
        i_glob = idx_loc + offset
        s_all = jax.lax.all_gather(s_loc, MODEL_AXIS)  # (S, B, kk)
        i_all = jax.lax.all_gather(i_glob, MODEL_AXIS)
        s_cat = jnp.transpose(s_all, (1, 0, 2)).reshape(b, -1)
        i_cat = jnp.transpose(i_all, (1, 0, 2)).reshape(b, -1)
        s_top, pos = jax.lax.top_k(s_cat, k)
        i_top = jnp.take_along_axis(i_cat, pos, axis=1)
        return i_top.astype(jnp.int32), s_top

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(MODEL_AXIS, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,  # outputs are replicated post-all_gather merge
    )
    return jax.jit(fn)(user_block, item_emb, rated_pad, unseen)


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
