"""Social MF rating family: SoRec, SoReg, SocialMF, RSTE, LOCABAL,
SocialFD, SREE.

Reference: model/rating/{SoRec,SoReg,SocialMF,RSTE,LOCABAL,SocialFD,SREE}.py.
Each reference model interleaves a per-sample rating SGD pass with a
per-edge/per-user social pass. Here both become terms of one jitted batch
loss: the rating part over minibatches, the social part over the full edge
arrays scaled by ``1/num_batches`` so its per-epoch magnitude matches the
reference's one-pass-per-epoch schedule. Social edge similarities (pearson/
cosine over sparse rows) are computed once on device in chunks
(ops/similarity.py).

Where the reference's hand-written updates treat a quantity as a constant
(e.g. SocialMF's followee mean, RSTE's social term), we reproduce that with
``stop_gradient`` rather than letting autodiff disagree with the reference.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.similarity import edge_cosine_sp, edge_pearson_sp
from .base import SocialRecommender, TrainSpec


def _social_scale(self):
    """Scale for a full-edge social term evaluated once per batch."""
    n = self.train_size
    num_batches = max(1, (n + self.batch_size - 1) // self.batch_size)
    return 1.0 / num_batches


class SoRec(SocialRecommender):
    """Co-factorize ratings and trust with shared P and relation factors Z;
    trust weight sqrt(d−(v)/(d+(u)+d−(v))) (SoRec.py:42-60)."""

    def read_configuration(self):
        super().read_configuration()
        self.reg_z = self.model_args().get_float("-z")

    def build(self):
        params = self.init_embeddings("uniform")
        rng = np.random.RandomState(self.seed)
        params["Z"] = jnp.asarray(
            rng.random_sample((self.num_users, self.emb_size)).astype(np.float32) / 10
        )
        src, dst, w = self.social.coo()
        # weight = sqrt(d−(v) / (d+(u) + d−(v))) (SoRec.py:45-50)
        vminus = self.social.in_degree[dst]
        uplus = self.social.out_degree[src]
        denom = uplus + vminus
        with np.errstate(invalid="ignore", divide="ignore"):
            trust_w = np.where(denom > 0, np.sqrt(vminus / np.maximum(denom, 1)), 1.0)
        target = jnp.asarray((trust_w * w).astype(np.float32))
        src_d, dst_d = jnp.asarray(src), jnp.asarray(dst)
        reg_u, reg_i, reg_s, reg_z = self.reg_u, self.reg_i, self.reg_s, self.reg_z
        scale = _social_scale(self)

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            pu = params["user_emb"][u]
            qi = params["item_emb"][i]
            err = r - jnp.sum(pu * qi, axis=1)
            rating = 0.5 * jnp.sum(wt * err**2) + 0.5 * (
                reg_u * jnp.sum(wt[:, None] * pu**2)
                + reg_i * jnp.sum(wt[:, None] * qi**2)
            )
            e_uv = target - jnp.sum(
                params["user_emb"][src_d] * params["Z"][dst_d], axis=1
            )
            social = scale * (
                0.5 * reg_s * jnp.sum(e_uv**2)
                + 0.5 * reg_z * jnp.sum(params["Z"] ** 2)
            )
            return rating + social

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )


class SoReg(SocialRecommender):
    """Social regularizer pulling connected users together with
    sim = (pearson + trust)/2 (SoReg.py:35-36,54-72)."""

    def read_configuration(self):
        super().read_configuration()
        self.alpha = self.model_args().get_float("-alpha")

    def build(self):
        params = self.init_embeddings("uniform")
        src, dst, w = self.social.coo()
        r_dense = self.dense_ratings()
        sim = (
            np.asarray(
                edge_pearson_sp(r_dense, jnp.asarray(src), jnp.asarray(dst))
            )
            + w
        ) / 2.0
        sim_d = jnp.asarray(sim.astype(np.float32))
        src_d, dst_d = jnp.asarray(src), jnp.asarray(dst)
        reg_u, reg_i, alpha = self.reg_u, self.reg_i, self.alpha
        scale = _social_scale(self)

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            pu = params["user_emb"][u]
            qi = params["item_emb"][i]
            err = r - jnp.sum(pu * qi, axis=1)
            rating = 0.5 * jnp.sum(wt * err**2) + 0.5 * (
                reg_u * jnp.sum(wt[:, None] * pu**2)
                + reg_i * jnp.sum(wt[:, None] * qi**2)
            )
            diff = params["user_emb"][src_d] - params["user_emb"][dst_d]
            social = scale * 0.5 * alpha * jnp.sum(
                sim_d[:, None] * diff**2
            )
            return rating + social

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )


class SocialMF(SocialRecommender):
    """Trust-propagation regularizer toward the weighted followee mean
    (SocialMF.py:26-43); the mean is a constant wrt gradients like the
    reference's update rule."""

    def build(self):
        params = self.init_embeddings("uniform")
        src, dst, w = self.social.coo()
        # row-normalized followee weights
        out_w = np.zeros(self.num_users, dtype=np.float32)
        np.add.at(out_w, src, w)
        norm_w = w / np.maximum(out_w[src], 1e-12)
        src_d, dst_d = jnp.asarray(src), jnp.asarray(dst)
        norm_w_d = jnp.asarray(norm_w.astype(np.float32))
        has_followees = jnp.asarray((out_w > 0).astype(np.float32))
        reg_u, reg_i, reg_s = self.reg_u, self.reg_i, self.reg_s
        scale = _social_scale(self)
        num_users = self.num_users

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            p = params["user_emb"]
            qi = params["item_emb"][i]
            pu = p[u]
            err = r - jnp.sum(pu * qi, axis=1)
            rating = 0.5 * jnp.sum(wt * err**2) + 0.5 * (
                reg_u * jnp.sum(wt[:, None] * pu**2)
                + reg_i * jnp.sum(wt[:, None] * qi**2)
            )
            mean = jax.ops.segment_sum(
                norm_w_d[:, None] * p[dst_d], src_d, num_segments=num_users,
            )
            diff = (p - jax.lax.stop_gradient(mean)) * has_followees[:, None]
            social = scale * 0.5 * reg_s * jnp.sum(diff**2)
            return rating + social

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )


class RSTE(SocialRecommender):
    """Trust-ensemble prediction αR + (1−α)·social (RSTE.py:22-58);
    gradients flow only through the α term, like the reference."""

    def read_configuration(self):
        super().read_configuration()
        self.alpha = self.model_args().get_float("-alpha")

    def _social_mean(self, p):
        """Followee-weighted mean of P rows (0 for users without followees)."""
        src, dst, w = self.social.coo()
        out_w = np.zeros(self.num_users, dtype=np.float32)
        np.add.at(out_w, src, w)
        norm_w = jnp.asarray(
            (w / np.maximum(out_w[src], 1e-12)).astype(np.float32)
        )
        mean = jax.ops.segment_sum(
            norm_w[:, None] * p[jnp.asarray(dst)],
            jnp.asarray(src),
            num_segments=self.num_users,
        )
        return mean, jnp.asarray((out_w > 0).astype(np.float32))

    def build(self):
        params = self.init_embeddings("uniform")
        reg_u, reg_i, alpha = self.reg_u, self.reg_i, self.alpha
        social_mean = self._social_mean

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            p = params["user_emb"]
            qi = params["item_emb"][i]
            pu = p[u]
            mean, has_f = social_mean(p)
            dot = jnp.sum(pu * qi, axis=1)
            social_dot = jnp.sum(
                jax.lax.stop_gradient(mean[u]) * qi, axis=1
            )
            blend = alpha * dot + (1 - alpha) * social_dot
            pred = jnp.where(has_f[u] > 0, blend, dot)
            err = r - pred
            # gradient coefficient α·err on p,q always (RSTE.py:35-37): the
            # stop_gradient on social_dot leaves exactly α flowing when the
            # user has followees; users without keep coefficient 1 via dot.
            return 0.5 * jnp.sum(wt * err**2) + 0.5 * (
                reg_u * jnp.sum(wt[:, None] * pu**2)
                + reg_i * jnp.sum(wt[:, None] * qi**2)
            )

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )

    def finalize(self, params, spec):
        p = params["user_emb"]
        mean, has_f = self._social_mean(p)
        alpha = self.alpha
        blended = alpha * p + (1 - alpha) * mean
        self.U = jnp.where(has_f[:, None] > 0, blended, p)
        self.V = params["item_emb"]
        self.final_params = params


class LOCABAL(SocialRecommender):
    """PageRank-weighted local+global social MF with similarity-matching
    matrix H (LOCABAL.py:23-44,46-84)."""

    def read_configuration(self):
        super().read_configuration()
        self.alpha = self.model_args().get_float("-alpha")

    def build(self):
        import networkx as nx

        params = self.init_embeddings("uniform")
        rng = np.random.RandomState(self.seed)
        params["H"] = jnp.asarray(
            rng.random_sample((self.emb_size, self.emb_size)).astype(np.float32)
        )
        # PageRank rank weights over the raw relation graph (LOCABAL.py:25-33)
        g = nx.DiGraph()
        for u1, u2, _ in self.social.relation:
            g.add_edge(u1, u2)
        pr = nx.pagerank(g, alpha=0.85) if g.number_of_nodes() else {}
        ranked = sorted(pr.items(), key=lambda d: d[1], reverse=True)
        w_map = {
            user: 1.0 / (1 + math.log(ind + 1))
            for ind, (user, _) in enumerate(ranked)
        }
        # per-uid rating-loss coefficient: users in W get (W_u + 1) — the
        # reference applies both the weighted and unweighted update
        # (LOCABAL.py:60-66)
        coeff = np.ones(self.num_users, dtype=np.float32)
        for user, wv in w_map.items():
            if user in self.data.user:
                coeff[self.data.user[user]] += wv
        coeff_d = jnp.asarray(coeff)
        # cosine similarity on social edges (LOCABAL.py:35-44)
        src, dst, _ = self.social.coo()
        r_dense = self.dense_ratings()
        sim = edge_cosine_sp(r_dense, jnp.asarray(src), jnp.asarray(dst))
        src_d, dst_d = jnp.asarray(src), jnp.asarray(dst)
        reg_u, reg_i, reg_s, alpha = self.reg_u, self.reg_i, self.reg_s, self.alpha
        scale = _social_scale(self)

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            p = params["user_emb"]
            pu = p[u]
            qi = params["item_emb"][i]
            err = r - jnp.sum(pu * qi, axis=1)
            rating = 0.5 * jnp.sum(wt * coeff_d[u] * err**2) + 0.5 * (
                reg_u * jnp.sum(wt[:, None] * pu**2)
                + reg_i * jnp.sum(wt[:, None] * qi**2)
            )
            h = params["H"]
            phq = jnp.sum((p[src_d] @ h) * p[dst_d], axis=1)
            e = sim - phq
            social = scale * (
                0.5 * alpha * jnp.sum(e**2) + 0.5 * reg_s * jnp.sum(h**2)
            )
            return rating + social

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )


class SREE(SocialRecommender):
    """Euclidean embedding with a social pull term (SREE.py:27-60):
    r̂ = μ + b_u + b_i − ||p_u − q_i||²."""

    def read_configuration(self):
        super().read_configuration()
        self.alpha = self.model_args().get_float("-alpha")

    def build(self):
        params = self.init_embeddings("uniform")
        rng = np.random.RandomState(self.seed)
        params["user_bias"] = jnp.asarray(
            rng.random_sample(self.num_users).astype(np.float32) / 10
        )
        params["item_bias"] = jnp.asarray(
            rng.random_sample(self.num_items).astype(np.float32) / 10
        )
        src, dst, w = self.social.coo()
        src_d, dst_d = jnp.asarray(src), jnp.asarray(dst)
        w_d = jnp.asarray(w)
        gm = self.data.global_mean
        reg_u, reg_i, reg_b, alpha = self.reg_u, self.reg_i, self.reg_b, self.alpha
        scale = _social_scale(self)

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            p = params["user_emb"]
            pu = p[u]
            qi = params["item_emb"][i]
            bu = params["user_bias"][u]
            bi = params["item_bias"][i]
            diff = pu - qi
            dist = jnp.sum(diff**2, axis=1)
            err = r - (gm + bu + bi - dist)
            rating = 0.5 * jnp.sum(wt * err**2) + 0.5 * (
                reg_u * jnp.sum(wt[:, None] * diff**2)
                + reg_b * (jnp.sum(wt * bu**2) + jnp.sum(wt * bi**2))
            )
            # social pull: only P[u] moves toward followees (SREE.py:47-60)
            sdiff = p[src_d] - jax.lax.stop_gradient(p[dst_d])
            social = scale * 0.5 * alpha * jnp.sum(w_d[:, None] * sdiff**2)
            return rating + social

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
        dist = np.sum((pu - qi) ** 2, axis=1)
        pred = self.data.global_mean + bu + bi - dist
        return np.where(known, pred, self.data.global_mean).astype(np.float64)

    def score_fn_params(self):
        # negative squared distance ranking (the reference's ranking path
        # SREE.py:74-80 *adds* the distance — an apparent sign bug we do not
        # reproduce; SREE ships as a rating model in config/SREE.conf)
        def score_fn(params, uids):
            pu = params["user_emb"][uids]  # (B, d)
            q = params["item_emb"]  # (I, d)
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


class SocialFD(SocialRecommender):
    """Metric-learning MF with Mahalanobis-style distance d = (x−y)HHᵀ(x−y)ᵀ
    and rating-regime push/pull rules (SocialFD.py:24-116).

    Loss-consistent reformulation of the reference's hand-written updates:
    high ratings (> 0.7) pull pairs together (+ηα·d), low ratings (≤ 0.5)
    push apart within the unit ball (+ηα·relu(1−d)·(−1)… i.e. −ηα·min(d,1)),
    social followees pull with weight ηβ.
    """

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.alpha = args.get_float("-alpha")
        self.eta = args.get_float("-eta")
        self.beta = args.get_float("-beta")

    def build(self):
        params = self.init_embeddings("uniform")
        params["user_emb"] = params["user_emb"] / 10
        params["item_emb"] = params["item_emb"] / 10
        rng = np.random.RandomState(self.seed)
        params["H"] = jnp.asarray(
            rng.random_sample((self.emb_size, self.emb_size)).astype(np.float32) / 5
        )
        params["user_bias"] = jnp.asarray(
            rng.random_sample(self.num_users).astype(np.float32) / 5
        )
        params["item_bias"] = jnp.asarray(
            rng.random_sample(self.num_items).astype(np.float32) / 5
        )
        src, dst, _ = self.social.coo()
        src_d, dst_d = jnp.asarray(src), jnp.asarray(dst)
        gm = self.data.global_mean
        reg_u, reg_i = self.reg_u, self.reg_i
        eta, alpha, beta = self.eta, self.alpha, self.beta
        scale = _social_scale(self)

        def mdist(h, diff):
            z = diff @ h
            return jnp.sum(z**2, axis=1)

        def loss_fn(params, batch, rng):
            u, i, r, wt = batch
            x = params["user_emb"][u]
            y = params["item_emb"][i]
            h = params["H"]
            bu = params["user_bias"][u]
            bi = params["item_bias"][i]
            d = mdist(h, x - y)
            err = r - (gm + bu + bi - d)
            base = 0.5 * jnp.sum(wt * err**2)
            high = (r > 0.7).astype(jnp.float32)
            low = (r <= 0.5).astype(jnp.float32)
            regime = eta * alpha * jnp.sum(
                wt * (high * d - low * jnp.minimum(d, 1.0))
            )
            reg = 0.5 * (
                reg_u * jnp.sum(wt[:, None] * x**2)
                + reg_i * jnp.sum(wt[:, None] * y**2)
                + reg_u * jnp.sum(wt * bu**2)
                + reg_i * jnp.sum(wt * bi**2)
            )
            sdiff = params["user_emb"][src_d] - jax.lax.stop_gradient(
                params["user_emb"][dst_d]
            )
            social = scale * eta * beta * jnp.sum(mdist(h, sdiff))
            return base + regime + reg + social

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )

    def finalize(self, params, spec):
        super().finalize(params, spec)
        self.H = params["H"]
        self.Bu = params["user_bias"]
        self.Bi = params["item_bias"]

    def predict_ratings(self, users, items):
        uids, iids = self._ids(users, items)
        known = (uids >= 0) & (iids >= 0)
        x = np.asarray(self.U)[np.maximum(uids, 0)]
        y = np.asarray(self.V)[np.maximum(iids, 0)]
        h = np.asarray(self.H)
        bu = np.asarray(self.Bu)[np.maximum(uids, 0)]
        bi = np.asarray(self.Bi)[np.maximum(iids, 0)]
        d = np.sum(((x - y) @ h) ** 2, axis=1)
        pred = self.data.global_mean + bu + bi - d
        return np.where(known, pred, self.data.global_mean).astype(np.float64)

    def score_fn_params(self):
        def score_fn(params, uids):
            x = params["user_emb"][uids] @ params["H"]  # (B, d)
            y = params["item_emb"] @ params["H"]  # (I, d)
            d2 = (
                jnp.sum(x**2, axis=1)[:, None]
                - 2 * x @ y.T
                + jnp.sum(y**2, axis=1)[None, :]
            )
            return (
                params["gm"] + params["user_bias"][uids][:, None]
                + params["item_bias"][None, :] - d2
            )

        return score_fn, {
            "user_emb": self.U,
            "item_emb": self.V,
            "H": self.H,
            "user_bias": self.Bu,
            "item_bias": self.Bi,
            "gm": jnp.asarray(self.data.global_mean, dtype=jnp.float32),
        }
