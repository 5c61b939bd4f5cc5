"""On-device negative sampling and CSR membership tests.

Replaces the reference's per-batch host Python rejection sampler
(base/deepRecommender.py:29-77) — the hottest host loop in QRec — with fully
jitted, vectorized device code:

* ``csr_searchsorted`` — fixed-iteration vectorized binary search inside
  per-user CSR rows (no dynamic shapes, XLA-friendly).
* ``sample_negatives`` — K-try uniform rejection sampling against the user's
  positives, falling back to an *exact* rejection-free draw for the (rare)
  queries where all K tries hit positives, so the reference's "never a train
  positive" guarantee holds unconditionally.
* ``sample_negatives_exact`` — rejection-free: draws k ~ U[0, I - deg(u)) and
  maps k to the k-th non-rated item by binary search over item space.
* ``pairwise_epoch`` / ``pointwise_epoch`` — epoch-level batch tensors
  matching the reference samplers' contracts.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _bisect_iters(n: int) -> int:
    return max(1, int(math.ceil(math.log2(max(n, 2)))) + 1)


def csr_searchsorted(
    indices: jnp.ndarray,  # (nnz,) int32, sorted within each row
    lo: jnp.ndarray,  # (B,) int32 row starts
    hi: jnp.ndarray,  # (B,) int32 row ends
    queries: jnp.ndarray,  # (B,) int32
    side: str = "left",
    n_iters: int = 32,
) -> jnp.ndarray:
    """Vectorized per-row ``searchsorted``: insertion point of each query in
    ``indices[lo:hi)``. Fixed iteration count keeps shapes static for XLA."""
    nnz = indices.shape[0]

    def body(_, state):
        lo_, hi_ = state
        active = lo_ < hi_
        mid = (lo_ + hi_) >> 1
        v = indices[jnp.minimum(mid, nnz - 1)]
        if side == "left":
            go_right = v < queries
        else:
            go_right = v <= queries
        new_lo = jnp.where(go_right, mid + 1, lo_)
        new_hi = jnp.where(go_right, hi_, mid)
        return (
            jnp.where(active, new_lo, lo_),
            jnp.where(active, new_hi, hi_),
        )

    lo_f, _ = lax.fori_loop(0, n_iters, body, (lo, hi))
    return lo_f


def pack_bitmask(u_indptr, u_indices, num_users: int, num_items: int):
    """Packed (U, ceil(I/32)) uint32 rated-bitmask (host build, numpy).

    One random 4-byte gather replaces the 2·log(deg) gathers of the CSR
    binary search — the membership test becomes a bit probe.
    """
    import numpy as np

    words = (num_items + 31) // 32
    mask = np.zeros((num_users, words), dtype=np.uint32)
    rows = np.repeat(
        np.arange(num_users, dtype=np.int64), np.diff(u_indptr)
    )
    cols = np.asarray(u_indices, dtype=np.int64)
    np.bitwise_or.at(
        mask, (rows, cols >> 5), (np.uint32(1) << (cols & 31).astype(np.uint32))
    )
    return mask


def bitmask_member(mask: jnp.ndarray, users: jnp.ndarray, items: jnp.ndarray):
    """Vectorized membership probe against a packed bitmask."""
    words = mask[users, items >> 5]
    return (words >> (items & 31).astype(jnp.uint32)) & 1 > 0


def csr_member(
    indices: jnp.ndarray,
    indptr: jnp.ndarray,
    users: jnp.ndarray,  # (B,) int32
    items: jnp.ndarray,  # (B,) int32
    n_iters: int = 32,
) -> jnp.ndarray:
    """Vectorized "did user u rate item i?" membership test (bool (B,))."""
    lo = indptr[users]
    hi = indptr[users + 1]
    pos = csr_searchsorted(indices, lo, hi, items, "left", n_iters)
    nnz = indices.shape[0]
    return (pos < hi) & (indices[jnp.minimum(pos, nnz - 1)] == items)


def sample_negatives_exact(
    rng: jax.Array,
    users: jnp.ndarray,  # (B,) int32
    num_items: int,
    indices: jnp.ndarray,
    indptr: jnp.ndarray,
    row_iters: int = 32,
) -> jnp.ndarray:
    """Rejection-free uniform negatives: for user u draw
    k ~ U[0, I - deg(u)) and return the k-th *non-rated* item.

    The k-th non-rated item is the smallest j with
    ``(j+1) - rank_le(u, j) >= k+1`` where ``rank_le`` counts rated items
    <= j; both searches are fixed-iteration binary searches.
    """
    lo_row = indptr[users]
    hi_row = indptr[users + 1]
    deg = hi_row - lo_row
    k = jax.random.randint(rng, users.shape, 0, jnp.maximum(num_items - deg, 1))

    item_iters = _bisect_iters(num_items)

    def body(_, state):
        lo_, hi_ = state
        active = lo_ < hi_
        mid = (lo_ + hi_) >> 1
        rank_le = (
            csr_searchsorted(indices, lo_row, hi_row, mid, "right", row_iters)
            - lo_row
        )
        nonrated_le = (mid + 1) - rank_le
        go_left = nonrated_le >= k + 1
        new_hi = jnp.where(go_left, mid, hi_)
        new_lo = jnp.where(go_left, lo_, mid + 1)
        return (
            jnp.where(active, new_lo, lo_),
            jnp.where(active, new_hi, hi_),
        )

    lo0 = jnp.zeros_like(users)
    hi0 = jnp.full_like(users, num_items - 1)
    # search over j in [0, num_items): invariant — answer in [lo, hi]
    lo_f, _ = lax.fori_loop(0, item_iters, body, (lo0, hi0))
    return lo_f


def sample_negatives(
    rng: jax.Array,
    users: jnp.ndarray,  # (B,) int32
    num_items: int,
    indices: jnp.ndarray,
    indptr: jnp.ndarray,
    num_tries: int = 8,
    row_iters: int = 32,
    bitmask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """K-try rejection sampling with exact fallback.

    Uniformly draws ``num_tries`` candidates per positive, picks the first
    that is not a training positive of the user; queries where every try hit
    a positive fall back to the exact rejection-free sampler. Semantics match
    the reference's loop-until-miss sampler (deepRecommender.py:42-47) while
    staying fully on device with static shapes. With ``bitmask`` the
    membership test is a packed-word probe instead of a CSR binary search.
    """
    b = users.shape[0]
    rng_c, rng_e = jax.random.split(rng)
    cands = jax.random.randint(
        rng_c, (b, num_tries), 0, num_items, dtype=jnp.int32
    )
    if bitmask is not None:
        member = bitmask_member(
            bitmask, users[:, None], cands
        )
    else:
        member = csr_member(
            indices,
            indptr,
            jnp.repeat(users[:, None], num_tries, axis=1).reshape(-1),
            cands.reshape(-1),
            row_iters,
        ).reshape(b, num_tries)
    ok = ~member
    first_ok = jnp.argmax(ok, axis=1)  # 0 if none ok — handled below
    chosen = cands[jnp.arange(b), first_ok]
    any_ok = jnp.any(ok, axis=1)

    # the exact fallback is ~P(density^num_tries) rare; run it only when some
    # query actually failed (lax.cond skips the whole branch at runtime)
    def with_exact(_):
        exact = sample_negatives_exact(
            rng_e, users, num_items, indices, indptr, row_iters
        )
        return jnp.where(any_ok, chosen, exact)

    return jax.lax.cond(
        jnp.all(any_ok), lambda _: chosen, with_exact, operand=None
    ).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("num_items", "batch_size", "num_tries", "row_iters", "shuffle"),
)
def pairwise_epoch(
    rng: jax.Array,
    train_u: jnp.ndarray,  # (n,) int32
    train_i: jnp.ndarray,  # (n,) int32
    indices: jnp.ndarray,
    indptr: jnp.ndarray,
    num_items: int,
    batch_size: int,
    num_tries: int = 8,
    row_iters: int = 32,
    bitmask=None,
    shuffle: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shuffled (user, pos, neg, weight) tensors for one epoch, shaped
    ``(num_batches, batch_size)``; ``weight`` zeroes the padded tail.

    Mirrors next_batch_pairwise (deepRecommender.py:29-52): shuffle the
    training pairs, then one uniform non-positive negative per positive.
    ``shuffle=False`` keeps the training-pair file order with fresh
    negatives per epoch — BPR's own TF batcher iterates sequentially
    (BPR.py:57-64)."""
    n = train_u.shape[0]
    rng_perm, rng_neg = jax.random.split(rng)
    perm = (
        jax.random.permutation(rng_perm, n)
        if shuffle
        else jnp.arange(n, dtype=jnp.int32)
    )
    num_batches = (n + batch_size - 1) // batch_size
    padded = num_batches * batch_size
    pad_idx = jnp.concatenate([perm, jnp.zeros(padded - n, dtype=perm.dtype)])
    users = train_u[pad_idx]
    pos = train_i[pad_idx]
    weight = (jnp.arange(padded) < n).astype(jnp.float32)
    neg = sample_negatives(
        rng_neg, users, num_items, indices, indptr, num_tries, row_iters,
        bitmask=bitmask,
    )
    shape = (num_batches, batch_size)
    return (
        users.reshape(shape),
        pos.reshape(shape),
        neg.reshape(shape),
        weight.reshape(shape),
    )


@partial(
    jax.jit,
    static_argnames=("num_items", "batch_size", "num_negatives", "num_tries", "row_iters"),
)
def pointwise_epoch(
    rng: jax.Array,
    train_u: jnp.ndarray,
    train_i: jnp.ndarray,
    indices: jnp.ndarray,
    indptr: jnp.ndarray,
    num_items: int,
    batch_size: int,
    num_negatives: int = 4,
    num_tries: int = 8,
    row_iters: int = 32,
    bitmask=None,
):
    """Pointwise batches: each positive followed by ``num_negatives`` uniform
    negatives labeled 0 (deepRecommender.py:54-77). Returns (users, items,
    labels, weight) shaped ``(num_batches, batch_size*(1+num_negatives))``."""
    n = train_u.shape[0]
    rng_perm, rng_neg = jax.random.split(rng)
    perm = jax.random.permutation(rng_perm, n)
    num_batches = (n + batch_size - 1) // batch_size
    padded = num_batches * batch_size
    pad_idx = jnp.concatenate([perm, jnp.zeros(padded - n, dtype=perm.dtype)])
    users_pos = train_u[pad_idx]
    items_pos = train_i[pad_idx]
    w_pos = (jnp.arange(padded) < n).astype(jnp.float32)
    users_neg = jnp.repeat(users_pos, num_negatives)
    negs = sample_negatives(
        rng_neg, users_neg, num_items, indices, indptr, num_tries, row_iters,
        bitmask=bitmask,
    )
    k = 1 + num_negatives
    users = jnp.stack(
        [users_pos] + [users_neg.reshape(padded, num_negatives)[:, j] for j in range(num_negatives)],
        axis=1,
    ).reshape(padded * k)
    items = jnp.stack(
        [items_pos] + [negs.reshape(padded, num_negatives)[:, j] for j in range(num_negatives)],
        axis=1,
    ).reshape(padded * k)
    labels = jnp.tile(
        jnp.concatenate([jnp.ones(1), jnp.zeros(num_negatives)]), padded
    ).astype(jnp.float32)
    weight = jnp.repeat(w_pos, k)
    shape = (num_batches, batch_size * k)
    return (
        users.reshape(shape),
        items.reshape(shape),
        labels.reshape(shape),
        weight.reshape(shape),
    )
