"""Shallow matrix-factorization family: BasicMF, PMF, SVD, BPR.

Reference: model/rating/BasicMF.py, model/rating/PMF.py, model/rating/SVD.py,
model/ranking/BPR.py. The reference trains these with per-sample NumPy SGD
(plus optional TF1 minibatch paths); here each is a jitted minibatch loss
under the shared training loop, with the bold-driver LR schedule and
``|Δloss|<1e-3`` convergence preserved for the SGD family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import losses as L
from .base import IterativeRecommender, TrainSpec


class BasicMF(IterativeRecommender):
    """Plain MF on explicit ratings, no regularization in the gradient
    (BasicMF.py:9-26): loss = Σ (r - p·q)²."""

    reg_in_loss = False

    def build(self):
        params = self.init_embeddings("uniform")
        reg_u, reg_i = self.reg_u, self.reg_i
        use_reg = self.reg_in_loss

        def loss_fn(params, batch, rng):
            u, i, r, w = batch
            pu = params["user_emb"][u]
            qi = params["item_emb"][i]
            err = r - jnp.sum(pu * qi, axis=1)
            loss = 0.5 * jnp.sum(w * err**2)
            if use_reg:
                loss = loss + 0.5 * (
                    reg_u * jnp.sum(w[:, None] * pu**2)
                    + reg_i * jnp.sum(w[:, None] * qi**2)
                )
            return loss

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )


class PMF(IterativeRecommender):
    """L2-regularized MF (PMF.py:9-28): per-sample gradients
    ``err*q - regU*p`` / ``err*p - regI*q``."""

    def build(self):
        params = self.init_embeddings("uniform")
        reg_u, reg_i = self.reg_u, self.reg_i

        def loss_fn(params, batch, rng):
            u, i, r, w = batch
            pu = params["user_emb"][u]
            qi = params["item_emb"][i]
            err = r - jnp.sum(pu * qi, axis=1)
            return 0.5 * jnp.sum(w * err**2) + 0.5 * (
                reg_u * jnp.sum(w[:, None] * pu**2)
                + reg_i * jnp.sum(w[:, None] * qi**2)
            )

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )


class SVD(IterativeRecommender):
    """Biased MF with global mean (SVD.py:13-35,76-82):
    r̂ = p·q + μ + b_u + b_i."""

    def build(self):
        params = self.init_embeddings("uniform")
        rng = np.random.RandomState(self.seed)
        params["user_bias"] = jnp.asarray(
            rng.random_sample(self.num_users).astype(np.float32) / 5
        )
        params["item_bias"] = jnp.asarray(
            rng.random_sample(self.num_items).astype(np.float32) / 5
        )
        reg_u, reg_i, reg_b = self.reg_u, self.reg_i, self.reg_b
        gm = self.data.global_mean

        def loss_fn(params, batch, rng):
            u, i, r, w = batch
            pu = params["user_emb"][u]
            qi = params["item_emb"][i]
            bu = params["user_bias"][u]
            bi = params["item_bias"][i]
            pred = jnp.sum(pu * qi, axis=1) + gm + bu + bi
            err = r - pred
            return 0.5 * jnp.sum(w * err**2) + 0.5 * (
                reg_u * jnp.sum(w[:, None] * pu**2)
                + reg_i * jnp.sum(w[:, None] * qi**2)
                + reg_b * (jnp.sum(w * bu**2) + jnp.sum(w * bi**2))
            )

        return TrainSpec(
            params, loss_fn, self.rating_sampler(), mode="bold", track_best=False
        )

    def finalize(self, params, spec):
        super().finalize(params, spec)
        self.Bu = params["user_bias"]
        self.Bi = params["item_bias"]

    def _extra_state(self):
        return {"user_bias": self.Bu, "item_bias": self.Bi}

    def _set_extra_state(self, state):
        self.Bu = state["user_bias"]
        self.Bi = state["item_bias"]

    def predict_ratings(self, users, items):
        uids, iids = self._ids(users, items)
        known = (uids >= 0) & (iids >= 0)
        u_emb = np.asarray(self.U)[np.maximum(uids, 0)]
        v_emb = np.asarray(self.V)[np.maximum(iids, 0)]
        bu = np.asarray(self.Bu)[np.maximum(uids, 0)]
        bi = np.asarray(self.Bi)[np.maximum(iids, 0)]
        pred = np.sum(u_emb * v_emb, axis=1) + self.data.global_mean + bu + bi
        # reference SVD falls straight to globalMean when either id is
        # unknown (SVD.py:76-82)
        return np.where(known, pred, self.data.global_mean).astype(np.float64)

    def score_fn_params(self):
        def score_fn(params, uids):
            scores = (
                jnp.dot(
                    params["user_emb"][uids],
                    params["item_emb"].T,
                    preferred_element_type=jnp.float32,
                )
                + params["gm"]
                + params["item_bias"][None, :]
                + params["user_bias"][uids][:, None]
            )
            return scores

        return score_fn, {
            "user_emb": self.U,
            "item_emb": self.V,
            "user_bias": self.Bu,
            "item_bias": self.Bi,
            "gm": jnp.asarray(self.data.global_mean, dtype=jnp.float32),
        }


class BPR(IterativeRecommender):
    """Bayesian Personalized Ranking (BPR.py:19-53): pairwise sigmoid loss
    with per-sample L2 on the touched factors, bold-driver SGD.

    Under ``evaluation.setup ... -tf`` the reference's TF path differs in
    two load-bearing ways (BPR.py:77-96): embeddings init as truncated
    normal σ=0.005 (iterativeRecommender.py:47-48) instead of U(0,1)/3, and
    the regularizer is ``regU·(l2_loss(U)+l2_loss(V))`` over the FULL
    tables per minibatch (regU for both) instead of the touched rows.
    Matching both closed a −0.010 Recall oracle gap (PARITY.md)."""

    def build(self):
        tf_path = self.eval_settings.contains("-tf")
        params = self.init_embeddings("normal" if tf_path else "uniform")
        reg_u, reg_i = self.reg_u, self.reg_i

        def loss_fn(params, batch, rng):
            u, i, j, w = batch
            pu = params["user_emb"][u]
            qi = params["item_emb"][i]
            qj = params["item_emb"][j]
            pos = jnp.sum(pu * qi, axis=1)
            neg = jnp.sum(pu * qj, axis=1)
            if tf_path:
                # -sum(log(sigmoid(y)+1e-6)) + regU*(l2(U)+l2(V))  (BPR.py:84-85)
                loss = -jnp.sum(
                    w * jnp.log(jax.nn.sigmoid(pos - neg) + 1e-6)
                )
                reg = reg_u * 0.5 * (
                    jnp.sum(params["user_emb"] ** 2)
                    + jnp.sum(params["item_emb"] ** 2)
                )
            else:
                loss = L.bpr_loss(pos, neg, w)
                reg = 0.5 * (
                    reg_u * jnp.sum(w[:, None] * pu**2)
                    + reg_i * jnp.sum(w[:, None] * (qi**2 + qj**2))
                )
            return loss + reg

        return TrainSpec(
            params,
            loss_fn,
            # BPR's own TF batcher iterates the training pairs sequentially,
            # unshuffled, with fresh negatives per epoch (BPR.py:57-64)
            self.pairwise_sampler(shuffle=not tf_path),
            mode="bold",
            track_best=False,
        )
