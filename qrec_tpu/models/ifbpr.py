"""IF_BPR: implicit-friend BPR via meta-path heterogeneous walks
(model/ranking/IF_BPR.py).

Pipeline: meta-path walks (UIU/UFU/UTU/UFIU/UFUIU) over the positive and
negative interaction + trust networks → dual SGNS embeddings → positive /
negative top-K implicit friend lists → 4-tier preference chain
P ≻ Joint ≻ PS ≻ rand ≻ Neg with an adaptive per-user similarity threshold
learned by gradient (IF_BPR.py optimization_thres).

Negative feedback comes from ``<ratings>_n.txt`` next to the rating file
(IF_BPR.py:35-44); when absent the negative channel is empty and the model
degrades gracefully (the reference would crash).

Walks are vectorized per meta-path step on the host; dead-end walkers are
dropped like the reference's exception-abandoned paths.
"""

from __future__ import annotations

import os
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..config import OptionConf
from ..ops import sampling as S
from ..ops.walks import topk_cosine_neighbors, train_skipgram, walk_pairs
from .base import SocialRecommender

META_PATHS = [("UIU", 10), ("UFU", 8), ("UTU", 8), ("UFIU", 5), ("UFUIU", 5)]


def _weighted_csr(pairs_dict, n):
    """CSR from {node: [(nbr, weight), ...]}."""
    rows, cols, vals = [], [], []
    for u, lst in pairs_dict.items():
        for v, w in lst:
            rows.append(u)
            cols.append(v)
            vals.append(w)
    return sp.csr_matrix(
        (np.array(vals, dtype=np.float32), (rows, cols)), shape=(n, n)
    )


def _step(csr, cur, rng):
    """One vectorized weighted step; returns (next, ok_mask)."""
    indptr, indices, data = csr.indptr, csr.indices, csr.data
    deg = np.diff(indptr)
    ok = deg[cur] > 0
    flat_cum = np.cumsum(data.astype(np.float64))
    row_base = np.concatenate([[0.0], flat_cum])[indptr]
    row_total = np.asarray(csr.sum(axis=1)).ravel()
    safe = np.where(ok, cur, 0)
    targets = row_base[safe] + rng.random_sample(len(cur)) * row_total[safe]
    pos = np.minimum(
        np.searchsorted(flat_cum, targets, side="right"), len(indices) - 1
    )
    nxt = indices[pos].astype(np.int32)
    return np.where(ok, nxt, cur).astype(np.int32), ok


class IF_BPR(SocialRecommender):
    def read_configuration(self):
        super().read_configuration()
        options = OptionConf(self.config["IF_BPR"])
        self.walk_length = options.get_int("-L")
        self.walk_dim = options.get_int("-l")
        self.win_size = options.get_int("-w")
        self.top_k = options.get_int("-k")
        self.alpha = options.get_float("-a")
        self.neg_count = options.get_int("-neg", 5)

    # ------------------------------------------------------------------
    def _read_negative_feedback(self):
        path = self.config["ratings"][:-4] + "_n.txt"
        neg_u, neg_i = [], []
        if os.path.exists(path):
            with open(path) as f:
                for line in f:
                    toks = line.strip().split()
                    if len(toks) >= 2 and toks[0] in self.data.user:
                        if toks[1] in self.data.item:
                            neg_u.append(self.data.user[toks[0]])
                            neg_i.append(self.data.item[toks[1]])
        return (
            np.array(neg_u, dtype=np.int32),
            np.array(neg_i, dtype=np.int32),
        )

    def _relation_nets(self):
        """UF (trusts) and UT (trusted-by) nets weighted by common-neighbor
        count + 1 (IF_BPR.py:93-111)."""
        nu = self.num_users
        uf = defaultdict(list)
        ut = defaultdict(list)
        followees = {
            self.data.user[u]: {
                self.data.user[v] for v in self.social.followees[u]
            }
            for u in self.social.followees
            if u in self.data.user
        }
        followers = {
            self.data.user[u]: {
                self.data.user[v] for v in self.social.followers[u]
            }
            for u in self.social.followers
            if u in self.data.user
        }
        for u, vs in followees.items():
            for v in vs:
                if v in followees and u != v:
                    w = len(followees[u] & followees[v]) + 1
                    uf[u].append((v, w))
        for u, vs in followers.items():
            for v in vs:
                if v in followers and u != v:
                    w = len(followers[u] & followers[v]) + 1
                    ut[u].append((v, w))
        return _weighted_csr(uf, nu), _weighted_csr(ut, nu)

    def _interaction_csrs(self, users, items):
        """U→I and I→U uniform-choice CSRs from an edge list."""
        ui = sp.csr_matrix(
            (np.ones(len(users), dtype=np.float32), (users, items)),
            shape=(self.num_users, self.num_items),
        )
        return ui.tocsr(), ui.T.tocsr()

    def _meta_path_walks(self, ui, iu, uf, ut, rng):
        """Typed walks over one channel; item tokens offset by num_users."""
        nu = self.num_users
        walks_all = []
        for mp, cnt in META_PATHS:
            steps = mp[1:]
            repeats = max(1, self.walk_length // len(steps))
            starts = np.repeat(
                np.arange(nu, dtype=np.int32), cnt
            )
            cur = starts.copy()
            last_type = "U"
            seq = [starts + 0]  # user tokens = raw ids
            valid = np.ones(len(cur), dtype=bool)
            for _ in range(repeats):
                for tp in steps:
                    if tp == "I":
                        nxt, ok = _step(ui, cur, rng)  # cur: user → item id
                        token = nxt + nu
                    elif tp == "U" and last_type == "I":
                        nxt, ok = _step(iu, cur, rng)  # cur: item → user id
                        token = nxt
                    elif tp == "T" or (tp == "U" and last_type == "T"):
                        nxt, ok = _step(ut, cur, rng)
                        token = nxt
                    else:  # 'F', or 'U' following U/F (IF_BPR.py:127-153)
                        nxt, ok = _step(uf, cur, rng)
                        token = nxt
                    cur = np.where(ok, nxt, cur).astype(np.int32)
                    valid &= ok
                    seq.append(token.astype(np.int32))
                    last_type = tp
            walk = np.stack(seq, axis=1)
            walks_all.append(walk[valid])
        if not walks_all:
            return np.zeros((0, 2), dtype=np.int32)
        width = min(w.shape[1] for w in walks_all)
        return np.concatenate([w[:, :width] for w in walks_all], axis=0)

    def _friend_lists(self):
        rng = np.random.RandomState(self.seed)
        uf, ut = self._relation_nets()
        pos_ui, pos_iu = self._interaction_csrs(
            self.data.train_u, self.data.train_i
        )
        neg_u, neg_i = self._read_negative_feedback()
        nu = self.num_users
        vocab = nu + self.num_items

        def embed(ui, iu):
            walks = self._meta_path_walks(ui, iu, uf, ut, rng)
            if len(walks) == 0:
                return None
            centers, contexts = walk_pairs(walks, self.win_size)
            active = np.unique(walks.ravel())
            emb = train_skipgram(
                centers, contexts, vocab, self.walk_dim, active,
                epochs=3, seed=self.seed,
            )
            return emb[:nu]

        print("Generating meta-path walks / embeddings (positive)...")
        w_pos = embed(pos_ui, pos_iu)
        k = min(self.top_k, max(nu - 1, 1))
        users_all = jnp.arange(nu, dtype=jnp.int32)
        p_ids, p_sims = topk_cosine_neighbors(w_pos, users_all, k)
        p_ids, p_sims = np.asarray(p_ids), np.asarray(p_sims)
        threshold = p_sims[:, min(k // 2, k - 1)].copy()
        half = max(1, k // 2)
        avg_sim = p_sims[:, :half].mean(axis=1)

        n_ids = None
        if len(neg_u):
            print("Generating meta-path walks / embeddings (negative)...")
            neg_ui, neg_iu = self._interaction_csrs(neg_u, neg_i)
            g_neg = embed(neg_ui, neg_iu)
            if g_neg is not None:
                n_ids = np.asarray(
                    topk_cosine_neighbors(g_neg, users_all, k)[0]
                )
        return p_ids, p_sims, n_ids, threshold, avg_sim, (neg_u, neg_i)

    # ------------------------------------------------------------------
    def fit(self):
        p_ids, p_sims, n_ids, threshold, avg_sim, neg_fb = self._friend_lists()
        nu, ni = self.num_users, self.num_items
        # split into true friends (pos∩neg top-k) and pos-only friends
        if n_ids is not None:
            true_mask = np.zeros_like(p_ids, dtype=bool)
            for u in range(nu):
                inter = set(p_ids[u]) & set(n_ids[u])
                true_mask[u] = np.isin(p_ids[u], list(inter))
        else:
            true_mask = np.ones_like(p_ids, dtype=bool)  # all friends joint

        r = sp.csr_matrix(
            (
                np.ones_like(self.data.train_u, dtype=np.float32),
                (self.data.train_u, self.data.train_i),
            ),
            shape=(nu, ni),
        )
        r.data[:] = 1.0

        def tier_table(friend_ids, mask, sims=None):
            """CSR of friends' positive items (excluding own) with the
            max contributing-friend sim as values."""
            rows, cols, vals = [], [], []
            for u in range(nu):
                for j, f in enumerate(friend_ids[u]):
                    if not mask[u, j]:
                        continue
                    s = sims[u, j] if sims is not None else 1.0
                    rows.append(u)
                    cols.append(int(f))
                    vals.append(s)
            t = sp.csr_matrix(
                (np.array(vals, dtype=np.float32), (rows, cols)), shape=(nu, nu)
            )
            items = t @ r
            simmax = (
                np.asarray(t.max(axis=1).todense()).ravel()
                if t.nnz
                else np.zeros(nu)
            )
            items = items - items.multiply(r)
            items.eliminate_zeros()
            items = items.tocsr()
            return items, simmax.astype(np.float32)

        joint_items, joint_simmax = tier_table(p_ids, true_mask, p_sims)
        joint_simmax_d = jnp.asarray(joint_simmax)
        ps_items, _ = tier_table(p_ids, ~true_mask, p_sims)
        # negative tier: negative-feedback items of negative top-k friends
        if n_ids is not None and len(neg_fb[0]):
            rn = sp.csr_matrix(
                (
                    np.ones(len(neg_fb[0]), dtype=np.float32),
                    (neg_fb[0], neg_fb[1]),
                ),
                shape=(nu, ni),
            )
            fsel = sp.csr_matrix(
                (
                    np.ones(n_ids.size, dtype=np.float32),
                    (np.repeat(np.arange(nu), n_ids.shape[1]), n_ids.ravel()),
                ),
                shape=(nu, nu),
            )
            neg_items = (fsel @ rn) - (fsel @ rn).multiply(r)
            neg_items.eliminate_zeros()
            neg_items = neg_items.tocsr()
        else:
            neg_items = sp.csr_matrix((nu, ni), dtype=np.float32)

        tables = {}
        for name, m in (("joint", joint_items), ("ps", ps_items), ("neg", neg_items)):
            idx = m.indices.astype(np.int32)
            dat = m.data.astype(np.float32)
            if len(idx) == 0:  # empty tier: dummy entry, never sampled
                idx = np.zeros(1, dtype=np.int32)
                dat = np.zeros(1, dtype=np.float32)
            tables[name] = (
                jnp.asarray(m.indptr.astype(np.int32)),
                jnp.asarray(idx),
                jnp.asarray(dat),
            )

        params = {
            "user_emb": jnp.ones((nu, self.emb_size), dtype=jnp.float32) * 0.1,
            "item_emb": jnp.asarray(
                np.random.RandomState(self.seed)
                .random_sample((ni, self.emb_size))
                .astype(np.float32)
                / 3
            ),
        }
        threshold_d = jnp.asarray(threshold)
        avg_sim_d = jnp.asarray(avg_sim)
        p_sims_d = jnp.asarray(p_sims)
        ta = self.train_arrays
        reg_u, reg_i, alpha = self.reg_u, self.reg_i, self.alpha
        bs = self.batch_size
        n = self.train_size
        num_batches = (n + bs - 1) // bs
        padded = num_batches * bs
        row_iters = S._bisect_iters(
            int(np.max(np.diff(self.data.u_indptr))) if n else 1
        )
        # true-friend pull pairs (P[u] toward P[f] when sim > threshold)
        pull_src = np.repeat(np.arange(nu, dtype=np.int32), p_ids.shape[1])
        pull_dst = p_ids.ravel().astype(np.int32)
        pull_sim = p_sims.ravel().astype(np.float32)
        pull_true = true_mask.ravel().astype(np.float32)
        pull_src_d, pull_dst_d = jnp.asarray(pull_src), jnp.asarray(pull_dst)
        pull_sim_d, pull_true_d = jnp.asarray(pull_sim), jnp.asarray(pull_true)

        def sample_tier(rng, users, name):
            indptr, indices, vals = tables[name]
            lo = indptr[users]
            deg = indptr[users + 1] - lo
            off = jnp.floor(
                jax.random.uniform(rng, users.shape) * jnp.maximum(deg, 1)
            ).astype(jnp.int32)
            idx = jnp.minimum(lo + off, indices.shape[0] - 1)
            return indices[idx], (deg > 0), vals[idx]

        @jax.jit
        def sampler(rng):
            rs = jax.random.split(rng, 5)
            perm = jax.random.permutation(rs[0], n)
            pad = jnp.concatenate([perm, jnp.zeros(padded - n, dtype=perm.dtype)])
            users = ta["u"][pad]
            pos = ta["i"][pad]
            w = (jnp.arange(padded) < n).astype(jnp.float32)
            k_it, k_has, _ = sample_tier(rs[1], users, "joint")
            # the contributing friend's similarity, approximated by the
            # user's strongest joint friend (the reference keeps one
            # arbitrary contributing friend per item — IF_BPR.py:291-301)
            k_sim = joint_simmax_d[users]
            p_it, p_has, _ = sample_tier(rs[2], users, "ps")
            n_it, n_has, _ = sample_tier(rs[3], users, "neg")
            r_it = S.sample_negatives(
                rs[4], users, ni, ta["indices"], ta["indptr"], 8, row_iters
            )
            shape = (num_batches, bs)
            return tuple(
                x.reshape(shape)
                for x in (users, pos, k_it, k_sim, p_it, n_it, r_it,
                          k_has, p_has, n_has, w)
            )

        def loss_fn(params, state, batch, rng):
            (u, i, k_it, k_sim, p_it, n_it, r_it, k_has, p_has, n_has, w) = batch
            thr, avg = state
            p = params["user_emb"][u]
            q = params["item_emb"]

            def sc(items):
                return jnp.sum(p * q[items], axis=1)

            y_i = sc(i)
            # adaptive-threshold joint tier (optimization_thres)
            qualifies = k_has & (k_sim >= thr[u])
            g_theta = jax.nn.sigmoid(
                (k_sim - thr[u]) / jnp.where(
                    jnp.abs(avg[u] - thr[u]) > 1e-6, avg[u] - thr[u], 1e-6
                )
            )
            y_k = sc(k_it)
            m_joint = qualifies.astype(jnp.float32) * w
            margin = (y_i - y_k) / (1 + g_theta)
            joint_loss = -jnp.sum(
                m_joint * jnp.log(jax.nn.sigmoid(margin) + 1e-10)
            )
            # threshold derivative (IF_BPR.py optimization_thres tail)
            s_val = jax.nn.sigmoid(margin)
            t_deriv = (
                -g_theta * (1 - g_theta) * (1 - s_val) * (y_i - y_k)
                * (k_sim - avg[u])
                / jnp.maximum((avg[u] - thr[u]) ** 2, 1e-8)
                / (1 + g_theta) ** 2
                + 0.005 * thr[u]
            )
            t_deriv = jax.lax.stop_gradient(t_deriv * m_joint)
            # remaining chain: last ≻ ps ≻ rand ≻ neg with tier skipping
            loss = joint_loss
            last_y = jnp.where(qualifies, y_k, y_i)
            for items, has in ((p_it, p_has), (r_it, None), (n_it, n_has)):
                y = sc(items)
                m = w if has is None else has.astype(jnp.float32) * w
                loss = loss - jnp.sum(
                    m * jnp.log(jax.nn.sigmoid(last_y - y) + 1e-10)
                )
                if has is None:
                    last_y = y
                else:
                    last_y = jnp.where(has, y, last_y)
            reg = 0.5 * (
                reg_u * jnp.sum(w[:, None] * p**2)
                + reg_i * jnp.sum(w[:, None] * (q[i] ** 2 + q[r_it] ** 2))
            )
            # true-friend pull (one-sided), full edge set scaled per batch
            pull_w = pull_true_d * (pull_sim_d > thr[pull_src_d]).astype(
                jnp.float32
            )
            diff = params["user_emb"][pull_src_d] - jax.lax.stop_gradient(
                params["user_emb"][pull_dst_d]
            )
            pull = (
                0.5 * alpha * jnp.sum(pull_w[:, None] * diff**2) / num_batches
            )
            acc = jax.ops.segment_sum(t_deriv, u, num_segments=nu)
            cnt = jax.ops.segment_sum(m_joint, u, num_segments=nu)
            return loss + reg + pull, (acc, cnt)

        optimizer = optax.adam(self.lrate)
        opt_state = optimizer.init(params)

        @jax.jit
        def run_epoch(params, opt_state, thr, avg, batches, rng):
            nb = jax.tree_util.tree_leaves(batches)[0].shape[0]
            rngs = jax.random.split(rng, nb)

            def step(carry, xs):
                params, opt_state, acc, cnt = carry
                batch, r = xs
                (loss, (a, c)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, (thr, avg), batch, r)
                upd, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, upd)
                return (params, opt_state, acc + a, cnt + c), loss

            zeros = jnp.zeros(nu)
            (params, opt_state, acc, cnt), losses = jax.lax.scan(
                step, (params, opt_state, zeros, zeros), (batches, rngs)
            )
            # per-epoch threshold update (IF_BPR.py:363-371)
            new_thr = jnp.where(
                cnt > 0, thr - self.lrate * acc / jnp.maximum(cnt, 1), thr
            )
            qual = (p_sims_d >= new_thr[:, None]).astype(jnp.float32)
            qual_cnt = jnp.sum(qual, axis=1)
            new_avg = jnp.where(
                qual_cnt > 0,
                jnp.sum(p_sims_d * qual, axis=1) / jnp.maximum(qual_cnt, 1),
                new_thr,
            )
            return params, opt_state, new_thr, new_avg, jnp.sum(losses)

        rng = jax.random.PRNGKey(self.seed + 1)
        thr, avg = threshold_d, avg_sim_d
        for epoch in range(self.max_epoch):
            rng, rs, re = jax.random.split(rng, 3)
            batches = sampler(rs)
            params, opt_state, thr, avg, loss = run_epoch(
                params, opt_state, thr, avg, batches, re
            )
            if (epoch + 1) % 5 == 0 or epoch == self.max_epoch - 1:
                print(
                    f"{self.model_name} {self.fold} epoch {epoch + 1}: "
                    f"loss = {float(loss):.4f}"
                )
        self.U = params["user_emb"]
        self.V = params["item_emb"]
