"""Network-embedding (walk-based) family: CUNE_MF, CUNE_BPR.

Reference: model/rating/CUNE_MF.py, model/ranking/CUNE_BPR.py. Pipeline:
co-rating user network → weighted random walks (host, vectorized) → SGNS
user embeddings (device; replaces gensim word2vec) → top-K cosine implicit
friends (device) → MF/BPR training with friend-derived tiers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import OptionConf
from ..ops import losses as L
from ..ops import sampling as S
from ..ops.walks import (
    cooccurrence_network,
    random_walks,
    topk_cosine_neighbors,
    train_skipgram,
    walk_pairs,
)
from .base import IterativeRecommender, TrainSpec


class _WalkBase(IterativeRecommender):
    """Shared walk→embedding→top-K-friends pipeline."""

    param_key = None  # e.g. 'CUNE-BPR' — the reference's dashed conf key

    def read_configuration(self):
        super().read_configuration()
        options = OptionConf(self.config[self.param_key])
        self.walk_count = options.get_int("-T")
        self.walk_length = options.get_int("-L")
        self.walk_dim = options.get_int("-l")
        self.win_size = options.get_int("-w")
        self.top_k = options.get_int("-k")
        self._options = options

    def implicit_friends(self):
        """(friend_ids, active_users): (A, k) node-id table of top-K implicit
        friends per active user."""
        print("Building collaborative user network...")
        net = cooccurrence_network(self.data)
        print("Generating random deep walks...")
        rng = np.random.RandomState(self.seed)
        walks, active = random_walks(
            net, self.walk_count, self.walk_length, rng
        )
        print("Generating user embedding...")
        centers, contexts = walk_pairs(walks, self.win_size)
        emb = train_skipgram(
            centers,
            contexts,
            self.num_users,
            self.walk_dim,
            active,
            seed=self.seed,
        )
        print("Constructing similarity matrix...")
        k = min(self.top_k, max(len(active) - 1, 1))
        ids, _ = topk_cosine_neighbors(emb, jnp.asarray(active), k)
        return np.asarray(ids), active

    def friend_item_table(self, friend_ids, active):
        """CSR of implicit-friend items per user, own positives removed
        (CUNE_BPR.py:284-296)."""
        rows = np.repeat(active, friend_ids.shape[1])
        r = sp.csr_matrix(
            (
                np.ones_like(self.data.train_u, dtype=np.float32),
                (self.data.train_u, self.data.train_i),
            ),
            shape=(self.num_users, self.num_items),
        )
        r.data[:] = 1.0
        f = sp.csr_matrix(
            (
                np.ones(len(rows), dtype=np.float32),
                (rows, friend_ids.ravel()),
            ),
            shape=(self.num_users, self.num_users),
        )
        f.data[:] = 1.0
        fp = f @ r
        fp = fp - fp.multiply(r)
        fp.eliminate_zeros()
        fp = fp.tocsr()
        fp.data[:] = 1.0
        return fp


class CUNE_MF(_WalkBase):
    """PMF + pull toward top-K implicit friends (CUNE_MF.py:283-307)."""

    param_key = "CUNE-MF"

    def read_configuration(self):
        super().read_configuration()
        self.alpha = self._options.get_float("-a")

    def build(self):
        friend_ids, active = self.implicit_friends()
        src = np.repeat(active, friend_ids.shape[1]).astype(np.int32)
        dst = friend_ids.ravel().astype(np.int32)
        src_d, dst_d = jnp.asarray(src), jnp.asarray(dst)
        params = self.init_embeddings("uniform")
        reg_u, reg_i, alpha = self.reg_u, self.reg_i, self.alpha
        num_batches = max(
            1, (self.train_size + self.batch_size - 1) // self.batch_size
        )
        scale = 1.0 / num_batches

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            pu = params["user_emb"][u]
            qi = params["item_emb"][i]
            err = r - jnp.sum(pu * qi, axis=1)
            rating = 0.5 * jnp.sum(wt * err**2) + 0.5 * (
                reg_u * jnp.sum(wt[:, None] * pu**2)
                + reg_i * jnp.sum(wt[:, None] * qi**2)
            )
            # one-sided pull toward friends (CUNE_MF.py:298-303)
            diff = params["user_emb"][src_d] - jax.lax.stop_gradient(
                params["user_emb"][dst_d]
            )
            social = scale * 0.5 * alpha * jnp.sum(diff**2)
            return rating + social

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )


class CUNE_BPR(_WalkBase):
    """Two-tier BPR over implicit friends' items: i ≻ k with unit margin,
    k ≻ j with margin scaled by 1/s, 3 draws per positive
    (CUNE_BPR.py:292-341)."""

    param_key = "CUNE-BPR"

    def read_configuration(self):
        super().read_configuration()
        self.s = self._options.get_float("-s")

    def build(self):
        friend_ids, active = self.implicit_friends()
        fp = self.friend_item_table(friend_ids, active)
        fp_indptr = jnp.asarray(fp.indptr.astype(np.int32))
        fp_indices = jnp.asarray(fp.indices.astype(np.int32))
        ta = self.train_arrays
        params = self.init_embeddings("uniform")
        reg_u, reg_i, s_margin = self.reg_u, self.reg_i, self.s
        num_items = self.num_items
        bs = self.batch_size
        n = self.train_size
        num_batches = (n + bs - 1) // bs
        padded = num_batches * bs
        row_iters = S._bisect_iters(
            int(np.max(np.diff(self.data.u_indptr))) if n else 1
        )
        n_draws = 3  # reference samples 3 times per positive

        @jax.jit
        def sampler(rng):
            rs = jax.random.split(rng, 2 + n_draws * 2)
            perm = jax.random.permutation(rs[0], n)
            pad = jnp.concatenate([perm, jnp.zeros(padded - n, dtype=perm.dtype)])
            users = ta["u"][pad]
            pos = ta["i"][pad]
            w = (jnp.arange(padded) < n).astype(jnp.float32)
            ks, js, has = [], [], None
            lo = fp_indptr[users]
            deg = fp_indptr[users + 1] - lo
            has_fp = deg > 0
            for t in range(n_draws):
                r_u = jax.random.uniform(rs[1 + t], users.shape)
                off = jnp.floor(r_u * jnp.maximum(deg, 1)).astype(jnp.int32)
                idx = jnp.minimum(lo + off, fp_indices.shape[0] - 1)
                ks.append(fp_indices[idx])
                js.append(
                    S.sample_negatives(
                        rs[1 + n_draws + t], users, num_items,
                        ta["indices"], ta["indptr"], 8, row_iters,
                    )
                )
            shape = (num_batches, bs)
            out = [users.reshape(shape), pos.reshape(shape)]
            out += [k.reshape(shape) for k in ks]
            out += [j.reshape(shape) for j in js]
            out += [has_fp.reshape(shape), w.reshape(shape)]
            return tuple(out)

        def loss_fn(params, batch, rng):
            u, i = batch[0], batch[1]
            ks = batch[2 : 2 + n_draws]
            js = batch[2 + n_draws : 2 + 2 * n_draws]
            has_fp, w = batch[-2], batch[-1]
            p = params["user_emb"][u]
            q = params["item_emb"]
            y_i = jnp.sum(p * q[i], axis=1)
            has = has_fp.astype(jnp.float32) * w
            plain = (1.0 - has_fp.astype(jnp.float32)) * w
            loss = 0.0
            reg_items = q[i] ** 2
            for k_ids, j_ids in zip(ks, js):
                y_k = jnp.sum(p * q[k_ids], axis=1)
                y_j = jnp.sum(p * q[j_ids], axis=1)
                loss = loss + L.bpr_loss(y_i, y_k, has)
                loss = loss + L.bpr_loss(
                    (y_k - y_j) / s_margin, jnp.zeros_like(y_k), has
                )
                loss = loss + L.bpr_loss(y_i, y_j, plain)
                reg_items = reg_items + q[k_ids] ** 2 + q[j_ids] ** 2
            reg = 0.5 * (
                reg_u * jnp.sum(w[:, None] * p**2) * n_draws
                + reg_i * jnp.sum(w[:, None] * reg_items)
            )
            return loss + reg

        return TrainSpec(
            params, loss_fn, sampler, mode="bold", track_best=False
        )
