"""IRGAN: minimax generator/discriminator with policy-gradient generator
and importance sampling (model/ranking/IRGAN.py).

The reference loops user-by-user on the host for both the discriminator's
negative sampling (IRGAN.py:80-100) and the generator's policy-gradient
updates (IRGAN.py:141-168). Here both run as batched device computations:
user blocks of catalog logits, categorical sampling via
``jax.random.categorical``, and degree-masked padding to a static
``3*max_deg`` samples per user.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import IterativeRecommender

TEMPERATURE = 0.2  # IRGAN.py:87
SAMPLE_LAMBDA = 0.2  # IRGAN.py:143


def _uniform_init(rng, shape, scale=0.05):
    return jax.random.uniform(rng, shape, minval=-scale, maxval=scale)


def generator_sampling_dist(prob, pos_pad, pos_mask, deg, lam=SAMPLE_LAMBDA):
    """Importance-sampling proposal pn = (1-λ)·softmax + λ·uniform-over-
    positives (IRGAN.py:146-153): each user's positive items get a λ/|pos|
    probability bump. `pos_pad` is the padded (U, maxdeg) positive table,
    `pos_mask` its validity mask, `deg` the true positive counts."""
    bump = lam / jnp.maximum(deg, 1.0)
    pn = (1 - lam) * prob
    return pn.at[
        jnp.arange(prob.shape[0])[:, None], pos_pad
    ].add(bump[:, None] * pos_mask)


def importance_reward(d_logits, prob, pn, sample):
    """Policy-gradient reward 2·(σ(D)−0.5), importance-corrected by
    prob/pn at the sampled items (IRGAN.py:155-160)."""
    take = jnp.take_along_axis
    reward = 2 * (jax.nn.sigmoid(d_logits) - 0.5)
    return reward * take(prob, sample, 1) / jnp.maximum(take(pn, sample, 1), 1e-20)


class IRGAN(IterativeRecommender):
    eval_batch_size = 512

    def fit(self):
        rng = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(rng, 4)
        d = self.emb_size
        gen = {
            "user_emb": _uniform_init(ks[0], (self.num_users, d)),
            "item_emb": _uniform_init(ks[1], (self.num_items, d)),
            "item_bias": jnp.zeros(self.num_items),
        }
        dis = {
            "user_emb": _uniform_init(ks[2], (self.num_users, d)),
            "item_emb": _uniform_init(ks[3], (self.num_items, d)),
            "item_bias": jnp.zeros(self.num_items),
        }
        reg = self.reg_u
        data = self.data
        num_users, num_items = self.num_users, self.num_items
        max_deg = int(np.max(np.diff(data.u_indptr))) if self.train_size else 1
        # padded per-user positive item table
        pos_pad = np.full((num_users, max_deg), 0, dtype=np.int32)
        pos_mask = np.zeros((num_users, max_deg), dtype=np.float32)
        for u in range(num_users):
            row = data.user_row_ids(u)
            pos_pad[u, : len(row)] = row
            pos_mask[u, : len(row)] = 1.0
        pos_pad = jnp.asarray(pos_pad)
        pos_mask = jnp.asarray(pos_mask)
        deg = jnp.asarray(
            np.diff(data.u_indptr).astype(np.float32)
        )

        def all_logits(params, uids):
            return (
                jnp.dot(
                    params["user_emb"][uids],
                    params["item_emb"].T,
                    preferred_element_type=jnp.float32,
                )
                + params["item_bias"][None, :]
            )

        d_opt = optax.adam(self.lrate)
        g_opt = optax.adam(self.lrate)
        d_state = d_opt.init(dis)
        g_state = g_opt.init(gen)

        k_neg = 2 * max_deg  # 2 negatives per positive (IRGAN.py:91)
        k_gen = 3 * max_deg  # 3 samples per positive (IRGAN.py:155)

        @jax.jit
        def d_step(dis, d_state, gen, rng):
            """One discriminator epoch: generator-sampled negatives + CE."""

            def user_block(uids, key):
                logits = all_logits(gen, uids) / TEMPERATURE
                # zero out positives (IRGAN.py:89-90): set to -inf
                mask = jnp.zeros((uids.shape[0], num_items))
                mask = mask.at[
                    jnp.arange(uids.shape[0])[:, None], pos_pad[uids]
                ].add(-1e30 * pos_mask[uids])
                neg = jax.random.categorical(
                    key, logits + mask, axis=1, shape=(k_neg, uids.shape[0])
                ).T  # (B, k_neg)
                return neg

            uids = jnp.arange(num_users, dtype=jnp.int32)
            negs = user_block(uids, rng)  # (U, k_neg)
            neg_mask = (
                jnp.arange(k_neg)[None, :] < 2 * deg[:, None]
            ).astype(jnp.float32)

            def d_loss(dis):
                # positives
                pu = dis["user_emb"]  # (U, d)
                pos_logit = jnp.einsum(
                    "ud,upd->up", pu, dis["item_emb"][pos_pad]
                ) + dis["item_bias"][pos_pad]
                pos_ce = pos_mask * jax.nn.softplus(-pos_logit)
                neg_logit = jnp.einsum(
                    "ud,und->un", pu, dis["item_emb"][negs]
                ) + dis["item_bias"][negs]
                neg_ce = neg_mask * jax.nn.softplus(neg_logit)
                reg_l = reg * 0.5 * (
                    jnp.sum(dis["user_emb"] ** 2)
                    + jnp.sum(dis["item_emb"] ** 2)
                    + jnp.sum(dis["item_bias"] ** 2)
                )
                return jnp.sum(pos_ce) + jnp.sum(neg_ce) + reg_l

            loss, grads = jax.value_and_grad(d_loss)(dis)
            upd, d_state_new = d_opt.update(grads, d_state, dis)
            return optax.apply_updates(dis, upd), d_state_new, loss

        @jax.jit
        def g_step(gen, g_state, dis, rng):
            """One generator epoch: policy gradient with importance sampling."""
            uids = jnp.arange(num_users, dtype=jnp.int32)
            logits = all_logits(gen, uids)
            log_prob = jax.nn.log_softmax(logits, axis=1)
            prob = jnp.exp(log_prob)
            pn = generator_sampling_dist(prob, pos_pad, pos_mask, deg)
            sample = jax.random.categorical(
                rng, jnp.log(pn + 1e-20), axis=1, shape=(k_gen, num_users)
            ).T  # (U, k_gen)
            samp_mask = (
                jnp.arange(k_gen)[None, :] < 3 * deg[:, None]
            ).astype(jnp.float32)
            take = jnp.take_along_axis
            d_logits = jnp.einsum(
                "ud,ukd->uk", dis["user_emb"], dis["item_emb"][sample]
            ) + dis["item_bias"][sample]
            reward = importance_reward(d_logits, prob, pn, sample)
            reward = jax.lax.stop_gradient(reward) * samp_mask

            def g_loss(gen):
                lg = all_logits(gen, uids)
                lp = jax.nn.log_softmax(lg, axis=1)
                picked = take(lp, sample, 1)
                pg = -jnp.sum(picked * reward) / jnp.maximum(
                    jnp.sum(samp_mask), 1.0
                )
                reg_l = reg * 0.5 * (
                    jnp.sum(gen["user_emb"] ** 2)
                    + jnp.sum(gen["item_emb"] ** 2)
                    + jnp.sum(gen["item_bias"] ** 2)
                )
                return pg + reg_l

            loss, grads = jax.value_and_grad(g_loss)(gen)
            upd, g_state_new = g_opt.update(grads, g_state, gen)
            return optax.apply_updates(gen, upd), g_state_new, loss

        # the reference takes many small Adam steps per epoch (per-batch for
        # D, per-user for G — IRGAN.py:112-168); we take several full-batch
        # steps with fresh samples instead, keeping shapes static
        d_steps, g_steps = 5, 10
        rng = jax.random.PRNGKey(self.seed + 1)
        for epoch in range(self.max_epoch):
            for _ in range(d_steps):
                rng, rd = jax.random.split(rng)
                dis, d_state, dl = d_step(dis, d_state, gen, rd)
            for _ in range(g_steps):
                rng, rg = jax.random.split(rng)
                gen, g_state, gl = g_step(gen, g_state, dis, rg)
            if (epoch + 1) % 5 == 0 or epoch == self.max_epoch - 1:
                print(
                    f"{self.model_name} {self.fold} epoch {epoch + 1}: "
                    f"D_loss = {float(dl):.4f} G_loss = {float(gl):.4f}"
                )
        self.dis, self.gen = dis, gen
        # discriminator scores are used for ranking (IRGAN.py:176-180)
        self.U = dis["user_emb"]
        self.V = dis["item_emb"]
        self.item_bias = dis["item_bias"]

    def score_fn_params(self):
        def score_fn(params, uids):
            return (
                jnp.dot(
                    params["user_emb"][uids],
                    params["item_emb"].T,
                    preferred_element_type=jnp.float32,
                )
                + params["item_bias"][None, :]
            )

        return score_fn, {
            "user_emb": self.U,
            "item_emb": self.V,
            "item_bias": self.item_bias,
        }
