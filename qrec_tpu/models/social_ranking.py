"""Social ranking family: SBPR and TBPR.

Reference: model/ranking/SBPR.py, model/ranking/TBPR.py. Both extend BPR
with tiers of social evidence:

* SBPR — friend-consumed items form a middle tier i ≻ k ≻ j with the margin
  on (i, k) scaled by 1/(S_uk + 1) (SBPR.py:111-137, the batched TF path).
* TBPR — strong/weak-tie item sets from Jaccard tie strength, chained
  i ≻ joint ≻ weak ≻ strong ≻ negative (TBPR.py:135-160). The reference's
  learned-θ update path is dead code (optimization_theta is never invoked),
  so θ stays the median of the tie strengths — reproduced here by computing
  the tie sets once.

Friend-item tables are built host-side with sparse matrix products (trust ×
interactions) instead of per-user dict loops, then sampled on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops import losses as L
from ..ops import sampling as S
from .base import SocialRecommender, TrainSpec


def _csr_table(mat: sp.csr_matrix):
    """(indptr, indices, data) int32/float32 of a csr matrix."""
    return (
        mat.indptr.astype(np.int32),
        mat.indices.astype(np.int32),
        mat.data.astype(np.float32),
    )


def _sample_from_rows(rng, indptr, indices, users):
    """Uniformly sample one column per user from CSR rows (0-deg rows → 0)."""
    lo = indptr[users]
    deg = indptr[users + 1] - lo
    r = jax.random.uniform(rng, users.shape)
    off = jnp.floor(r * jnp.maximum(deg, 1)).astype(jnp.int32)
    idx = jnp.minimum(lo + off, indices.shape[0] - 1)
    return indices[idx], deg > 0, idx


class SBPR(SocialRecommender):
    """Social BPR with friend-consumed middle tier."""

    def _friend_items(self) -> sp.csr_matrix:
        """U×I counts of followees who consumed each item, own positives
        removed (SBPR.py:15-29)."""
        r = sp.csr_matrix(
            (
                np.ones_like(self.data.train_u, dtype=np.float32),
                (self.data.train_u, self.data.train_i),
            ),
            shape=(self.num_users, self.num_items),
        )
        r.data[:] = 1.0
        t = self.social.scipy_adjacency()
        fp = t @ r
        # zero own positives then prune
        own = r.copy()
        own.data[:] = 1.0
        fp = fp - fp.multiply(own)
        fp.eliminate_zeros()
        return fp.tocsr()

    def build(self):
        # The reference's TF path (the shipped conf's -tf — its numpy path
        # crashes upstream, see PARITY.md) differs structurally from a
        # faithful SBPR: truncated-normal init (iterativeRecommender.py:47),
        # sequential unshuffled batches, a RANDOM middle item with weight 0
        # for users without friend items (SBPR.py:98-100), log(σ(x)+1e-6),
        # and — upstream bug — NO regularization: SBPR.py:122-123 puts the
        # reg term on its own line after the loss statement, so the `+`
        # expression is dead. All mirrored here under -tf; the non-tf path
        # keeps the faithful-SBPR interpretation (touched-row reg, plain-BPR
        # fallback for social-cold users).
        tf_path = self.eval_settings.contains("-tf")
        params = self.init_embeddings("normal" if tf_path else "uniform")
        fp = self._friend_items()
        fp_indptr, fp_indices, fp_vals = map(jnp.asarray, _csr_table(fp))
        ta = self.train_arrays
        reg_u, reg_i = self.reg_u, self.reg_i
        num_items = self.num_items
        bs = self.batch_size
        n = self.train_size
        num_batches = (n + bs - 1) // bs
        padded = num_batches * bs
        row_iters = S._bisect_iters(
            int(np.max(np.diff(self.data.u_indptr))) if n else 1
        )
        fp_iters = S._bisect_iters(
            int(np.max(np.diff(fp.indptr))) if fp.nnz else 1
        )

        @jax.jit
        def sampler(rng):
            r_perm, r_fp, r_neg, r_rand = jax.random.split(rng, 4)
            perm = (
                jnp.arange(n, dtype=jnp.int32)
                if tf_path
                else jax.random.permutation(r_perm, n)
            )
            pad = jnp.concatenate([perm, jnp.zeros(padded - n, dtype=perm.dtype)])
            users = ta["u"][pad]
            pos = ta["i"][pad]
            w = (jnp.arange(padded) < n).astype(jnp.float32)
            k_items, has_fp, idx = _sample_from_rows(
                r_fp, fp_indptr, fp_indices, users
            )
            if tf_path:
                # ref: f_item = choice(item_list) with weight 0 when the
                # user has no friend items (SBPR.py:98-100)
                rand_k = jax.random.randint(
                    r_rand, users.shape, 0, num_items, dtype=jnp.int32
                )
                k_items = jnp.where(has_fp, k_items, rand_k)
            suk = jnp.where(has_fp, fp_vals[idx], 0.0)
            # negative: not a positive and not a friend item — rejection
            # against both CSRs with exact fallback on the rating CSR
            def draw(key):
                cand = jax.random.randint(key, users.shape, 0, num_items, dtype=jnp.int32)
                bad = S.csr_member(
                    ta["indices"], ta["indptr"], users, cand, row_iters
                ) | S.csr_member(fp_indices, fp_indptr, users, cand, fp_iters)
                return cand, bad

            keys = jax.random.split(r_neg, 9)
            neg, bad = draw(keys[0])
            for t in range(1, 8):
                cand, cbad = draw(keys[t])
                neg = jnp.where(bad, cand, neg)
                bad = bad & cbad
            exact = S.sample_negatives_exact(
                keys[8], users, num_items, ta["indices"], ta["indptr"], row_iters
            )
            neg = jnp.where(bad, exact, neg)
            shape = (num_batches, bs)
            return (
                users.reshape(shape), pos.reshape(shape),
                k_items.reshape(shape), neg.reshape(shape),
                suk.reshape(shape), has_fp.reshape(shape),
                w.reshape(shape),
            )

        def loss_fn(params, batch, rng):
            u, i, k, j, suk, has_fp, w = batch
            pu = params["user_emb"][u]
            qi = params["item_emb"][i]
            qk = params["item_emb"][k]
            qj = params["item_emb"][j]
            yi = jnp.sum(pu * qi, axis=1)
            yk = jnp.sum(pu * qk, axis=1)
            yj = jnp.sum(pu * qj, axis=1)
            y_ik = (yi - yk) / (suk + 1.0)
            y_kj = yk - yj
            if tf_path:
                # every row goes through the two-tier chain with the random
                # middle when social-cold; NO reg (SBPR.py:118-123)
                return -jnp.sum(
                    w * (
                        jnp.log(jax.nn.sigmoid(y_ik) + 1e-6)
                        + jnp.log(jax.nn.sigmoid(y_kj) + 1e-6)
                    )
                )
            has = has_fp.astype(jnp.float32) * w
            # users without friend items fall back to plain BPR i ≻ j
            plain = (1.0 - has_fp.astype(jnp.float32)) * w
            loss = (
                L.bpr_loss(y_ik, jnp.zeros_like(y_ik), has)
                + L.bpr_loss(y_kj, jnp.zeros_like(y_kj), has)
                + L.bpr_loss(yi, yj, plain)
            )
            reg = 0.5 * (
                reg_u * jnp.sum(w[:, None] * pu**2)
                + reg_i * jnp.sum(w[:, None] * (qi**2 + qj**2 + qk**2))
            )
            return loss + reg

        return TrainSpec(
            params, loss_fn, sampler, mode="bold", track_best=False
        )


class TBPR(SocialRecommender):
    """Strong/weak-tie BPR with the preference chain
    i ≻ joint ≻ weak ≻ strong ≻ negative (TBPR.py)."""

    def read_configuration(self):
        super().read_configuration()
        self.reg_t = self.model_args().get_float("-regT")

    def _tie_sets(self):
        """Jaccard tie strengths → median split → per-user joint/weak/strong
        item CSR tables (TBPR.py:20-42,107-135)."""
        src, dst, _ = self.social.coo()
        f = sp.csr_matrix(
            (np.ones(len(src), dtype=np.float32), (src, dst)),
            shape=(self.num_users, self.num_users),
        )
        f.data[:] = 1.0
        inter = np.asarray(f[src].multiply(f[dst]).sum(axis=1)).ravel()
        deg = np.asarray(f.sum(axis=1)).ravel()
        union = deg[src] + deg[dst] - inter
        strength = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        theta = np.median(strength) if len(strength) else 0.0
        strong_mask = strength > theta
        r = sp.csr_matrix(
            (
                np.ones_like(self.data.train_u, dtype=np.float32),
                (self.data.train_u, self.data.train_i),
            ),
            shape=(self.num_users, self.num_items),
        )
        r.data[:] = 1.0

        def tie_items(mask):
            t = sp.csr_matrix(
                (np.ones(mask.sum(), dtype=np.float32), (src[mask], dst[mask])),
                shape=(self.num_users, self.num_users),
            )
            items = t @ r
            items = items - items.multiply(r)  # drop own positives
            items.eliminate_zeros()
            items.data[:] = 1.0
            return items.tocsr()

        strong = tie_items(strong_mask)
        weak = tie_items(~strong_mask)
        joint = strong.multiply(weak).tocsr()
        joint.eliminate_zeros()
        strong = (strong - joint).tocsr()
        weak = (weak - joint).tocsr()
        strong.eliminate_zeros()
        weak.eliminate_zeros()
        return joint, weak, strong

    def build(self):
        params = self.init_embeddings("uniform")
        joint, weak, strong = self._tie_sets()
        tables = {
            name: tuple(map(jnp.asarray, _csr_table(m)))
            for name, m in (("joint", joint), ("weak", weak), ("strong", strong))
        }
        ta = self.train_arrays
        reg_u, reg_i = self.reg_u, self.reg_i
        num_items = self.num_items
        bs = self.batch_size
        n = self.train_size
        num_batches = (n + bs - 1) // bs
        padded = num_batches * bs
        row_iters = S._bisect_iters(
            int(np.max(np.diff(self.data.u_indptr))) if n else 1
        )

        @jax.jit
        def sampler(rng):
            rs = jax.random.split(rng, 5)
            perm = jax.random.permutation(rs[0], n)
            pad = jnp.concatenate([perm, jnp.zeros(padded - n, dtype=perm.dtype)])
            users = ta["u"][pad]
            pos = ta["i"][pad]
            w = (jnp.arange(padded) < n).astype(jnp.float32)
            picks, masks = [], []
            for t, name in enumerate(("joint", "weak", "strong")):
                indptr, indices, _ = tables[name]
                item, has, _ = _sample_from_rows(rs[1 + t], indptr, indices, users)
                picks.append(item)
                masks.append(has)
            neg = S.sample_negatives(
                rs[4], users, num_items, ta["indices"], ta["indptr"], 8, row_iters
            )
            shape = (num_batches, bs)
            out = [users.reshape(shape), pos.reshape(shape)]
            out += [p.reshape(shape) for p in picks]
            out += [m.reshape(shape) for m in masks]
            out += [neg.reshape(shape), w.reshape(shape)]
            return tuple(out)

        def loss_fn(params, batch, rng):
            u, i, jt, wk, st, m_j, m_w, m_s, k, w = batch
            p = params["user_emb"][u]
            q = params["item_emb"]

            def score(items):
                return jnp.sum(p * q[items], axis=1)

            y_i = score(i)
            loss = 0.0
            reg_items = q[i] ** 2 + q[k] ** 2
            # preference chain with skipping of absent tiers (TBPR.py:146-160)
            last_y = y_i
            for item, mask in ((jt, m_j), (wk, m_w), (st, m_s)):
                y = score(item)
                mk = mask.astype(jnp.float32) * w
                loss = loss + L.bpr_loss(last_y, y, mk)
                last_y = jnp.where(mask, y, last_y)
                reg_items = reg_items + jnp.where(
                    mask[:, None], q[item] ** 2, 0.0
                )
            loss = loss + L.bpr_loss(last_y, score(k), w)
            reg = 0.5 * (
                reg_u * jnp.sum(w[:, None] * p**2)
                + reg_i * jnp.sum(w[:, None] * reg_items)
            )
            return loss + reg

        return TrainSpec(
            params, loss_fn, sampler, mode="bold", track_best=False
        )
