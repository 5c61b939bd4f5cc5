"""Random-walk generation (host) + skip-gram embedding training (device).

The reference's walk-based models (CUNE-MF/CUNE-BPR/IF-BPR/RSGAN) generate
random walks in per-node Python loops (CUNE_BPR.py:156-227) and train
embeddings with gensim's C word2vec (CUNE_BPR.py:258). Here:

* walk generation is vectorized numpy — all walkers advance one step per
  iteration via a global-cumsum searchsorted trick (pointer-chasing stays
  host-side, as SURVEY §7 prescribes);
* embedding training is a jitted skip-gram with negative sampling (SGNS)
  over device-resident (center, context) pair tensors.

Divergences from the reference, by design: gensim's default CBOW becomes
SGNS (the standard deepwalk objective), the reference's ad-hoc
visited-node avoidance (CUNE_BPR.py:216-222) is dropped, and negatives are
uniform over walked nodes rather than unigram^0.75.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp


def cooccurrence_network(data, min_raters: int = 2) -> sp.csr_matrix:
    """Collaborative user network: weight(u,v) = |I_u ∩ I_v| over items with
    at least ``min_raters`` raters (CUNE_BPR.py:160-180)."""
    raters = np.diff(data.i_indptr)
    keep_items = np.where(raters >= min_raters)[0]
    sel = np.isin(data.train_i[data.csr_sel], keep_items)
    u = data.train_u[data.csr_sel][sel]
    i = data.train_i[data.csr_sel][sel]
    r = sp.csr_matrix(
        (np.ones(len(u), dtype=np.float32), (u, i)),
        shape=(data.num_users, data.num_items),
    )
    c = (r @ r.T).tocsr()
    c.setdiag(0)
    c.eliminate_zeros()
    return c


def random_walks(
    net: sp.csr_matrix,
    walk_count: int,
    walk_length: int,
    rng: np.random.RandomState,
) -> Tuple[np.ndarray, np.ndarray]:
    """Weighted random walks from every non-isolated node.

    Returns (walks, active_nodes): walks is (n_walkers, walk_length) int32.
    All walkers advance simultaneously; the per-row weighted choice uses a
    searchsorted over the globally accumulated weight vector.
    """
    from ..native import random_walks_native

    native = random_walks_native(
        net, walk_count, walk_length, int(rng.randint(0, 2**31))
    )
    if native is not None:
        return native

    indptr = net.indptr
    deg = np.diff(indptr)
    active = np.where(deg > 0)[0].astype(np.int32)
    if len(active) == 0:
        return np.zeros((0, walk_length), dtype=np.int32), active
    flat_cum = np.cumsum(net.data.astype(np.float64))
    row_base = np.concatenate([[0.0], flat_cum])[indptr]
    row_total = np.asarray(net.sum(axis=1)).ravel()

    cur = np.repeat(active, walk_count)
    walks = np.empty((len(cur), walk_length), dtype=np.int32)
    walks[:, 0] = cur
    for step in range(1, walk_length):
        targets = row_base[cur] + rng.random_sample(len(cur)) * row_total[cur]
        pos = np.searchsorted(flat_cum, targets, side="right")
        pos = np.minimum(pos, len(net.indices) - 1)
        cur = net.indices[pos].astype(np.int32)
        walks[:, step] = cur
    return walks, active


def walk_pairs(walks: np.ndarray, window: int) -> Tuple[np.ndarray, np.ndarray]:
    """All (center, context) pairs within ±window along each walk."""
    centers, contexts = [], []
    length = walks.shape[1]
    for off in range(1, window + 1):
        if off >= length:
            break
        centers.append(walks[:, :-off].ravel())
        contexts.append(walks[:, off:].ravel())
        centers.append(walks[:, off:].ravel())
        contexts.append(walks[:, :-off].ravel())
    if not centers:
        return np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.int32)
    return (
        np.concatenate(centers).astype(np.int32),
        np.concatenate(contexts).astype(np.int32),
    )


def train_skipgram(
    centers: np.ndarray,
    contexts: np.ndarray,
    num_nodes: int,
    dim: int,
    active_nodes: np.ndarray,
    epochs: int = 3,
    negatives: int = 5,
    batch_size: int = 8192,
    lr: float = 0.05,
    seed: int = 0,
) -> jnp.ndarray:
    """SGNS over the pair tensors; returns the input embedding (nodes, d)."""
    n = len(centers)
    if n == 0:
        return jnp.zeros((num_nodes, dim))
    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    params = {
        "in": jax.random.uniform(k1, (num_nodes, dim), minval=-0.5, maxval=0.5)
        / dim,
        "out": jnp.zeros((num_nodes, dim)),
    }
    active_d = jnp.asarray(active_nodes)
    num_batches = max(1, (n + batch_size - 1) // batch_size)
    padded = num_batches * batch_size
    centers_d = jnp.asarray(centers)
    contexts_d = jnp.asarray(contexts)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def loss_fn(params, c, ctx, negs):
        vc = params["in"][c]
        pos = jnp.sum(vc * params["out"][ctx], axis=1)
        neg = jnp.einsum("bd,bkd->bk", vc, params["out"][negs])
        return -(
            jnp.sum(jnp.log(jax.nn.sigmoid(pos) + 1e-10))
            + jnp.sum(jnp.log(jax.nn.sigmoid(-neg) + 1e-10))
        )

    @jax.jit
    def run_epoch(params, opt_state, rng):
        perm = jax.random.permutation(rng, n)
        pad = jnp.concatenate([perm, jnp.zeros(padded - n, dtype=perm.dtype)])
        cs = centers_d[pad].reshape(num_batches, batch_size)
        xs = contexts_d[pad].reshape(num_batches, batch_size)
        neg_idx = jax.random.randint(
            jax.random.fold_in(rng, 1),
            (num_batches, batch_size, negatives),
            0,
            active_d.shape[0],
        )
        negs = active_d[neg_idx]

        def step(carry, xs_):
            params, opt_state = carry
            c, ctx, ng = xs_
            loss, grads = jax.value_and_grad(loss_fn)(params, c, ctx, ng)
            upd, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, upd), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (cs, xs, negs)
        )
        return params, opt_state, jnp.sum(losses)

    for ep in range(epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state, _ = run_epoch(params, opt_state, sub)
    return params["in"]


@partial(jax.jit, static_argnames=("k", "chunk"))
def topk_cosine_neighbors(
    emb: jnp.ndarray,  # (N, d)
    active: jnp.ndarray,  # (A,) node ids with embeddings
    k: int,
    chunk: int = 1024,
):
    """Top-k cosine-similar *active* nodes for each active node.

    Returns (ids, sims) of shape (A, k) — ids are node ids. Chunked A×A
    similarity so memory stays at chunk×A.
    """
    normed = emb / (jnp.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
    act_emb = normed[active]
    a = active.shape[0]
    pad = (-a) % chunk
    padded = jnp.concatenate(
        [act_emb, jnp.zeros((pad, act_emb.shape[1]))]
    ).reshape(-1, chunk, act_emb.shape[1])
    self_idx = jnp.concatenate(
        [jnp.arange(a), jnp.zeros(pad, dtype=jnp.int32)]
    ).reshape(-1, chunk)

    def one(args):
        block, selfs = args
        sims = jnp.dot(block, act_emb.T, preferred_element_type=jnp.float32)
        sims = sims.at[jnp.arange(chunk), selfs].set(-jnp.inf)
        top_s, top_i = jax.lax.top_k(sims, k)
        return active[top_i], top_s

    ids, sims = jax.lax.map(one, (padded, self_idx))
    return ids.reshape(-1, k)[:a], sims.reshape(-1, k)[:a]
