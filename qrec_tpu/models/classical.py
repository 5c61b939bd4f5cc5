"""Classical family: UserKNN, ItemKNN, SlopeOne, SVD++, EE.

Reference: model/rating/{UserKNN,ItemKNN,SlopeOne,SVDPlusPlus,EE}.py. The
memory-based models' per-pair dict similarity loops (UserKNN.py:53-66,
SlopeOne.py:12-32) become dense masked matmuls over the rating matrix —
test-entity × all-entity similarity blocks on the MXU, then top-K neighbor
selection with ``lax.top_k``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import EvaluationError
from ..ops.similarity import (
    pairwise_cosine_sp,
    pairwise_euclidean_sp,
    pairwise_pearson,
)
from .base import IterativeRecommender, Recommender, TrainSpec

_SIM_FNS = {
    "pcc": pairwise_pearson,
    "cos": pairwise_cosine_sp,
    "euclidean": pairwise_euclidean_sp,
}


def _sim_fn(name: str):
    # reference dispatch defaults to cosine (qmath.py:108-114)
    return _SIM_FNS.get(name, pairwise_cosine_sp)


class UserKNN(Recommender):
    """Mean-centered weighted user kNN (UserKNN.py:28-66). Rating only —
    the reference refuses ranking (UserKNN.py:68-70)."""

    def read_configuration(self):
        self.sim = self.config["similarity"]
        self.neighbors = self.config.get_int("num.neighbors")

    def fit(self):
        pass

    def predict_ratings(self, users, items):
        data = self.data
        r_dense = jnp.asarray(data.dense_matrix())
        uids, iids = self._ids(users, items)
        uniq_users = np.unique(uids[uids >= 0])
        k = min(self.neighbors, max(data.num_users - 1, 1))
        sim_fn = _sim_fn(self.sim)
        # test-users × all-users similarity + top-K neighbors on device
        sims = sim_fn(r_dense, r_dense[jnp.asarray(uniq_users)])
        sims = sims.at[
            jnp.arange(len(uniq_users)), jnp.asarray(uniq_users)
        ].set(-jnp.inf)  # exclude self (UserKNN.py:57)
        top_sims, top_ids = jax.lax.top_k(sims, k)
        top_sims, top_ids = np.asarray(top_sims), np.asarray(top_ids)
        row_of = {int(u): j for j, u in enumerate(uniq_users)}
        user_means = data.user_means
        r_np = data.dense_matrix()
        out = np.empty(len(uids))
        for n, (u, i) in enumerate(zip(uids, iids)):
            if u < 0:
                # unknown user: all sims are 0 → global mean (UserKNN.py:44-48)
                out[n] = data.global_mean
                continue
            if i < 0:
                # unknown item: no neighbor rated it → user mean
                out[n] = user_means[u]
                continue
            j = row_of[int(u)]
            nbrs, s = top_ids[j], top_sims[j]
            r = r_np[nbrs, i]
            mask = r != 0
            ssum = float(np.sum(s[mask] * (r[mask] - user_means[nbrs][mask])))
            denom = float(np.sum(s[mask]))
            if ssum == 0:
                out[n] = user_means[u]
            else:
                out[n] = user_means[u] + ssum / denom
        return out

    def score_fn_params(self):
        raise EvaluationError(
            "Ranking for all items in UserKNN is not available."
        )


class ItemKNN(Recommender):
    """Mean-centered weighted item kNN (ItemKNN.py:27-71). Rating only."""

    def read_configuration(self):
        self.sim = self.config["similarity"]
        self.neighbors = self.config.get_int("num.neighbors")

    def fit(self):
        pass

    def predict_ratings(self, users, items):
        data = self.data
        r_t = jnp.asarray(data.dense_matrix().T)  # item rows
        uids, iids = self._ids(users, items)
        uniq_items = np.unique(iids[iids >= 0])
        if len(uniq_items) == 0:
            return np.full(len(uids), data.global_mean)
        k = min(self.neighbors, max(data.num_items - 1, 1))
        sim_fn = _sim_fn(self.sim)
        sims = sim_fn(r_t, r_t[jnp.asarray(uniq_items)])
        sims = sims.at[
            jnp.arange(len(uniq_items)), jnp.asarray(uniq_items)
        ].set(-jnp.inf)
        top_sims, top_ids = jax.lax.top_k(sims, k)
        top_sims, top_ids = np.asarray(top_sims), np.asarray(top_ids)
        row_of = {int(i): j for j, i in enumerate(uniq_items)}
        item_means = data.item_means
        r_np = data.dense_matrix()
        out = np.empty(len(uids))
        for n, (u, i) in enumerate(zip(uids, iids)):
            if i < 0:
                out[n] = data.global_mean
                continue
            if u < 0:
                out[n] = item_means[i]
                continue
            j = row_of[int(i)]
            nbrs, s = top_ids[j], top_sims[j]
            r = r_np[u, nbrs]
            mask = r != 0
            ssum = float(np.sum(s[mask] * (r[mask] - item_means[nbrs][mask])))
            denom = float(np.sum(s[mask]))
            if ssum == 0:
                out[n] = item_means[i]
            else:
                out[n] = item_means[i] + ssum / denom
        return out

    def score_fn_params(self):
        raise EvaluationError(
            "Ranking for all items in ItemKNN is not available."
        )


class SlopeOne(Recommender):
    """Item-pair average rating difference with frequency weighting
    (SlopeOne.py:12-54), as masked matmuls."""

    def fit(self):
        pass

    def predict_ratings(self, users, items):
        data = self.data
        r_np = data.dense_matrix()
        m_np = (r_np > 0).astype(np.float32)
        uids, iids = self._ids(users, items)
        uniq_items = np.unique(iids[iids >= 0])
        r_d = jnp.asarray(r_np)
        m_d = jnp.asarray(m_np)
        if len(uniq_items):
            cols = jnp.asarray(uniq_items)
            # freq[a, j] = common raters; diff_sum[a, j] = Σ (r_a − r_j)
            freq = m_d[:, cols].T @ m_d
            diff_sum = r_d[:, cols].T @ m_d - m_d[:, cols].T @ r_d
            diff = jnp.where(freq > 0, diff_sum / jnp.maximum(freq, 1), 0.0)
            freq_np = np.asarray(freq)
            diff_np = np.asarray(diff)
            row_of = {int(i): j for j, i in enumerate(uniq_items)}
        out = np.empty(len(uids))
        user_means, item_means = data.user_means, data.item_means
        for n, (u, i) in enumerate(zip(uids, iids)):
            if u >= 0 and i >= 0:
                j = row_of[int(i)]
                m_u = m_np[u]
                w = freq_np[j] * m_u
                ssum = float(np.sum((r_np[u] + diff_np[j]) * w))
                fsum = float(np.sum(w))
                out[n] = ssum / fsum if fsum else user_means[u]
            elif u >= 0:
                # user known, item unseen → user mean path via freqSum == 0
                out[n] = user_means[u]
            elif i >= 0:
                out[n] = item_means[i]
            else:
                out[n] = data.global_mean
        return out


class EE(IterativeRecommender):
    """Euclidean embedding (EE.py:15-44):
    r̂ = μ + b_u + b_i − ||p_u − q_i||².

    Trains with Adam, mirroring the reference's SHIPPED configuration:
    config/EE.conf sets ``-tf`` so the reference runs trainModel_tf
    (EE.py:38-67, AdamOptimizer on the true gradient). The hand-SGD path
    (EE.py:30-33) uses a non-gradient update (no factor 2, reg folded into
    the error multiplier) whose true-gradient analogue diverges at the
    shipped lr=0.02 — observed NaN by epoch 4 on FilmTrust. Without ``-tf``
    the mode is ``bold`` like the reference's numpy path (the bold driver's
    halving self-corrects at sane init LRs; the reference-run oracle measured
    MAE 0.630 vs the reference's 0.649 on the fixed FilmTrust split at
    init 0.005)."""

    def build(self):
        params = self.init_embeddings("uniform")
        rng = np.random.RandomState(self.seed)
        params["user_bias"] = jnp.asarray(
            rng.random_sample(self.num_users).astype(np.float32) / 10
        )
        params["item_bias"] = jnp.asarray(
            rng.random_sample(self.num_items).astype(np.float32) / 10
        )
        gm = self.data.global_mean
        reg_u, reg_b = self.reg_u, self.reg_b

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            pu = params["user_emb"][u]
            qi = params["item_emb"][i]
            bu = params["user_bias"][u]
            bi = params["item_bias"][i]
            diff = pu - qi
            err = r - (gm + bu + bi - jnp.sum(diff**2, axis=1))
            return 0.5 * jnp.sum(wt * err**2) + 0.5 * (
                reg_u * jnp.sum(wt[:, None] * diff**2)
                + reg_b * (jnp.sum(wt * bu**2) + jnp.sum(wt * bi**2))
            )

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )

    def finalize(self, params, spec):
        super().finalize(params, spec)
        self.Bu = params["user_bias"]
        self.Bi = params["item_bias"]

    def predict_ratings(self, users, items):
        uids, iids = self._ids(users, items)
        known = (uids >= 0) & (iids >= 0)
        pu = np.asarray(self.U)[np.maximum(uids, 0)]
        qi = np.asarray(self.V)[np.maximum(iids, 0)]
        bu = np.asarray(self.Bu)[np.maximum(uids, 0)]
        bi = np.asarray(self.Bi)[np.maximum(iids, 0)]
        pred = (
            self.data.global_mean + bu + bi - np.sum((pu - qi) ** 2, axis=1)
        )
        return np.where(known, pred, self.data.global_mean).astype(np.float64)

    def score_fn_params(self):
        def score_fn(params, uids):
            pu = params["user_emb"][uids]
            q = params["item_emb"]
            d2 = (
                jnp.sum(pu**2, axis=1)[:, None]
                - 2 * pu @ q.T
                + jnp.sum(q**2, axis=1)[None, :]
            )
            return (
                params["gm"] + params["user_bias"][uids][:, None]
                + params["item_bias"][None, :] - d2
            )

        return score_fn, {
            "user_emb": self.U,
            "item_emb": self.V,
            "user_bias": self.Bu,
            "item_bias": self.Bi,
            "gm": jnp.asarray(self.data.global_mean, dtype=jnp.float32),
        }


class SVDPlusPlus(IterativeRecommender):
    """SVD++ (SVDPlusPlus.py): implicit item factors Y averaged into the
    user representation, r̂ = (p_u + Σ_{j∈I_u} y_j / |I_u|)·q_i + μ + b_u + b_i."""

    def read_configuration(self):
        super().read_configuration()
        self.reg_y = self.model_args().get_float("-y")

    def build(self):
        params = self.init_embeddings("uniform")
        rng = np.random.RandomState(self.seed)
        params["user_bias"] = jnp.asarray(
            rng.random_sample(self.num_users).astype(np.float32)
        )
        params["item_bias"] = jnp.asarray(
            rng.random_sample(self.num_items).astype(np.float32)
        )
        params["Y"] = jnp.asarray(
            rng.random_sample((self.num_items, self.emb_size)).astype(np.float32)
        )
        # row-normalized binary interaction for the implicit mean
        sel_u = jnp.asarray(self.data.train_u[self.data.csr_sel])
        sel_i = jnp.asarray(self.data.train_i[self.data.csr_sel])
        deg = jnp.asarray(
            np.maximum(np.diff(self.data.u_indptr), 1).astype(np.float32)
        )
        num_users = self.num_users
        gm = self.data.global_mean
        reg_u, reg_i, reg_b, reg_y = self.reg_u, self.reg_i, self.reg_b, self.reg_y
        scale = 1.0 / max(
            1, (self.train_size + self.batch_size - 1) // self.batch_size
        )

        def implicit_mean(y):
            s = jax.ops.segment_sum(
                y[sel_i], sel_u, num_segments=num_users, indices_are_sorted=True
            )
            return s / deg[:, None]

        self._implicit_mean = implicit_mean

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            imp = implicit_mean(params["Y"])
            pu = params["user_emb"][u] + imp[u]
            qi = params["item_emb"][i]
            bu = params["user_bias"][u]
            bi = params["item_bias"][i]
            err = r - (jnp.sum(pu * qi, axis=1) + gm + bu + bi)
            reg = 0.5 * (
                reg_u * jnp.sum(wt[:, None] * params["user_emb"][u] ** 2)
                + reg_i * jnp.sum(wt[:, None] * qi**2)
                + reg_b * (jnp.sum(wt * bu**2) + jnp.sum(wt * bi**2))
            )
            reg_y_term = scale * 0.5 * reg_y * jnp.sum(params["Y"] ** 2)
            return 0.5 * jnp.sum(wt * err**2) + reg + reg_y_term

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )

    def finalize(self, params, spec):
        imp = self._implicit_mean(params["Y"])
        self.U = params["user_emb"] + imp
        self.V = params["item_emb"]
        self.Bu = params["user_bias"]
        self.Bi = params["item_bias"]
        self.final_params = params

    def predict_ratings(self, users, items):
        uids, iids = self._ids(users, items)
        known = (uids >= 0) & (iids >= 0)
        pu = np.asarray(self.U)[np.maximum(uids, 0)]
        qi = np.asarray(self.V)[np.maximum(iids, 0)]
        bu = np.asarray(self.Bu)[np.maximum(uids, 0)]
        bi = np.asarray(self.Bi)[np.maximum(iids, 0)]
        pred = np.sum(pu * qi, axis=1) + self.data.global_mean + bu + bi
        return np.where(known, pred, self.data.global_mean).astype(np.float64)

    def score_fn_params(self):
        def score_fn(params, uids):
            return (
                jnp.dot(
                    params["user_emb"][uids], params["item_emb"].T,
                    preferred_element_type=jnp.float32,
                )
                + params["gm"]
                + params["item_bias"][None, :]
                + params["user_bias"][uids][:, None]
            )

        return score_fn, {
            "user_emb": self.U,
            "item_emb": self.V,
            "user_bias": self.Bu,
            "item_bias": self.Bi,
            "gm": jnp.asarray(self.data.global_mean, dtype=jnp.float32),
        }
