"""ALS family: WRMF, ExpoMF, CoFactor, SERec.

Reference: model/ranking/WRMF.py, ExpoMF.py, CoFactor.py, SERec.py. The
per-row host solves (and ExpoMF/SERec's joblib pools) become chunked vmapped
Cholesky solves on device (ops/als.py); SPPMI construction stays host-side
(one-time sparse algebra) with device segment-sums for the per-item context
blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.als import exposure_posterior, solve_factors, weighted_ridge_batch
from .base import IterativeRecommender, SocialRecommender


class WRMF(IterativeRecommender):
    """Implicit ALS with confidence C = 1 + 10r (WRMF.py:17-67)."""

    def fit(self):
        rng = jax.random.PRNGKey(self.seed)
        ru, ri = jax.random.split(rng)
        d = self.emb_size
        # reference scales the U(0,1)/3 init by 10 (WRMF.py:14-15)
        x = jax.random.uniform(ru, (self.num_users, d)) * 10 / 3
        y = jax.random.uniform(ri, (self.num_items, d)) * 10 / 3
        r_dense = self.dense_ratings()
        rated_u = (r_dense > 0).astype(jnp.float32)
        conf_u = 1.0 + 10.0 * r_dense  # weights w = 1 + C
        conf_i = conf_u.T
        rated_i = rated_u.T
        reg = self.reg_u
        for epoch in range(self.max_epoch):
            x = solve_factors(y, conf_u, rated_u, reg)
            y = solve_factors(x, conf_i, rated_i, reg)
            loss = float(
                jnp.sum(
                    rated_u * (rated_u - x @ y.T) ** 2
                )
            )
            print(
                f"{self.model_name} {self.fold} epoch {epoch + 1}: "
                f"loss = {loss:.4f}"
            )
        self.U, self.V = x, y


class ExpoMF(IterativeRecommender):
    """Exposure-aware probabilistic MF trained by EM (ExpoMF.py)."""

    lam_theta = 1e-5
    lam_beta = 1e-5
    lam_y = 1.0
    init_mu = 0.01
    a_prior = 1.0
    b_prior = 99.0
    init_std = 0.01

    def fit(self):
        rng = np.random.RandomState(self.seed)
        d = self.emb_size
        theta = jnp.asarray(
            (self.init_std * rng.randn(self.num_users, d)).astype(np.float32)
        )
        beta = jnp.asarray(
            (self.init_std * rng.randn(self.num_items, d)).astype(np.float32)
        )
        mu = jnp.full((self.num_items,), self.init_mu, dtype=jnp.float32)
        r_dense = self.dense_ratings()
        rated = (r_dense > 0).astype(jnp.float32)
        lam_y = self.lam_y

        @jax.jit
        def em_epoch(theta, beta, mu):
            a_u = exposure_posterior(theta, beta, rated, lam_y, mu)
            theta = solve_factors(
                beta, a_u, rated, self.lam_theta / lam_y
            )
            a_u = exposure_posterior(theta, beta, rated, lam_y, mu)
            beta = solve_factors(
                theta, a_u.T, rated.T, self.lam_beta / lam_y
            )
            a_sum = jnp.sum(
                exposure_posterior(theta, beta, rated, lam_y, mu), axis=0
            )
            mu = (self.a_prior + a_sum - 1) / (
                self.a_prior + self.b_prior + self.num_users - 2
            )
            return theta, beta, mu

        for epoch in range(self.max_epoch):
            theta, beta, mu = em_epoch(theta, beta, mu)
            if (epoch + 1) % 5 == 0 or epoch == self.max_epoch - 1:
                print(f"{self.model_name} {self.fold} epoch {epoch + 1}")
        self.U, self.V = theta, beta


class SERec(SocialRecommender):
    """Social-exposure ExpoMF (SERec boost variant): the exposure prior of
    (u, i) is boosted by how much u's followees were exposed to i
    (SERec.py:15-100)."""

    lam_theta = 1e-5
    lam_beta = 1e-5
    lam_y = 0.01
    init_mu = 0.01
    a_prior = 1.0
    b_prior = 99.0
    s_boost = 2.2
    init_std = 0.5

    def fit(self):
        rng = np.random.RandomState(self.seed)
        d = self.emb_size
        theta = jnp.asarray(
            (self.init_std * rng.randn(self.num_users, d)).astype(np.float32)
        )
        beta = jnp.asarray(
            (self.init_std * rng.randn(self.num_items, d)).astype(np.float32)
        )
        mu = jnp.full(
            (self.num_users, self.num_items), self.init_mu, dtype=jnp.float32
        )
        r_dense = self.dense_ratings()
        rated = (r_dense > 0).astype(jnp.float32)
        trust = jnp.asarray(
            self.social.scipy_adjacency().toarray().astype(np.float32)
        )
        lam_y = self.lam_y
        s = self.s_boost

        @jax.jit
        def em_epoch(theta, beta, mu):
            a_u = exposure_posterior(theta, beta, rated, lam_y, mu)
            theta = solve_factors(beta, a_u, rated, self.lam_theta / lam_y)
            a_u = exposure_posterior(theta, beta, rated, lam_y, mu)
            beta = solve_factors(theta, a_u.T, rated.T, self.lam_beta / lam_y)
            a = exposure_posterior(theta, beta, rated, lam_y, mu)
            # reference tiles the global A_sum per user before the social
            # boost (SERec.py:88-92)
            a_sum = jnp.broadcast_to(
                jnp.sum(a, axis=0)[None, :], mu.shape
            )
            s_sum = trust @ a_sum
            mu = (self.a_prior + a_sum + (s - 1) * s_sum - 1) / (
                self.a_prior + self.b_prior + (s - 1) * s_sum
                + self.num_users - 2
            )
            return theta, beta, mu

        for epoch in range(self.max_epoch):
            theta, beta, mu = em_epoch(theta, beta, mu)
            if (epoch + 1) % 5 == 0 or epoch == self.max_epoch - 1:
                print(f"{self.model_name} {self.fold} epoch {epoch + 1}")
        self.U, self.V = theta, beta


class CoFactor(IterativeRecommender):
    """WRMF + SPPMI item-context co-factorization (CoFactor.py).

    SPPMI built host-side from the binary co-occurrence counts
    (CoFactor.py:30-82); the per-item context normal-equation blocks are
    device segment-sums over the SPPMI edge list.
    """

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.neg_count = max(1, args.get_int("-k"))
        self.reg_r = args.get_float("-gamma")
        self.filter = args.get_int("-filter")

    def _build_sppmi(self):
        r = sp.csr_matrix(
            (
                np.ones_like(self.data.train_u, dtype=np.float32),
                (self.data.train_u, self.data.train_i),
            ),
            shape=(self.num_users, self.num_items),
        )
        r.data[:] = 1.0
        raters = np.asarray(r.sum(axis=0)).ravel()
        keep = raters >= self.filter
        co = (r.T @ r).tocoo()
        mask = (
            (co.row != co.col)
            & keep[co.row]
            & keep[co.col]
            & (co.data > self.filter)
        )
        rows, cols, counts = co.row[mask], co.col[mask], co.data[mask]
        freq = np.zeros(self.num_items, dtype=np.float64)
        np.add.at(freq, rows, counts)
        d_total = freq.sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            val = np.log(
                counts * d_total / np.maximum(freq[rows] * freq[cols], 1e-12)
            ) - np.log(self.neg_count)
        val = np.maximum(val, 0.0)
        keep2 = val > 0
        rows, cols, val = rows[keep2], cols[keep2], val[keep2]
        if len(val):
            val = val / val.max()
        order = np.argsort(rows, kind="stable")
        return (
            rows[order].astype(np.int32),
            cols[order].astype(np.int32),
            val[order].astype(np.float32),
        )

    def fit(self):
        rng = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(rng, 3)
        d = self.emb_size
        x = jax.random.uniform(ks[0], (self.num_users, d)) * 10 / 3
        y = jax.random.uniform(ks[1], (self.num_items, d)) * 10 / 3
        rng_np = np.random.RandomState(self.seed)
        w = jnp.asarray(rng_np.random_sample(self.num_items).astype(np.float32) / 10)
        c = jnp.asarray(rng_np.random_sample(self.num_items).astype(np.float32) / 10)
        g = jnp.asarray(
            rng_np.random_sample((self.num_items, d)).astype(np.float32) / 10
        )
        sp_rows, sp_cols, sp_vals = self._build_sppmi()
        sp_rows_d = jnp.asarray(sp_rows)
        sp_cols_d = jnp.asarray(sp_cols)
        sp_vals_d = jnp.asarray(sp_vals)
        ctx_count = jnp.asarray(
            np.bincount(sp_rows, minlength=self.num_items).astype(np.float32)
        )
        has_ctx = ctx_count > 0
        r_dense = self.dense_ratings()
        rated_u = (r_dense > 0).astype(jnp.float32)
        conf_u = 1.0 + 10.0 * r_dense
        reg, reg_r = self.reg_u, self.reg_r
        num_items = self.num_items

        @jax.jit
        def epoch_fn(x, y, g, w, c):
            x = solve_factors(y, conf_u, rated_u, reg)
            # --- item update with SPPMI blocks (CoFactor.py:115-158) ---
            gam = g[sp_cols_d]
            bet = y[sp_cols_d]
            seg = lambda v: jax.ops.segment_sum(
                v, sp_rows_d, num_segments=num_items, indices_are_sorted=True
            )
            g1 = seg(gam[:, :, None] * gam[:, None, :])
            m1 = seg((sp_vals_d - w[sp_rows_d] - c[sp_cols_d])[:, None] * gam)
            g2 = seg(bet[:, :, None] * bet[:, None, :])
            m2 = seg((sp_vals_d - w[sp_cols_d] - c[sp_rows_d])[:, None] * bet)
            y_new = weighted_ridge_batch(
                x, conf_u.T, rated_u.T, reg, extra_a=g1, extra_b=m1
            )
            g_new = jnp.linalg.solve(
                g2 + reg_r * jnp.eye(y.shape[1]), m2[:, :, None]
            )[:, :, 0]
            g_new = jnp.where(has_ctx[:, None], g_new, g)
            upd_w = seg(
                sp_vals_d - jnp.sum(y_new[sp_rows_d] * gam, axis=1) - c[sp_cols_d]
            )
            upd_c = seg(
                sp_vals_d - jnp.sum(bet * g_new[sp_rows_d], axis=1) - w[sp_cols_d]
            )
            w_new = jnp.where(has_ctx, upd_w / jnp.maximum(ctx_count, 1), w)
            c_new = jnp.where(has_ctx, upd_c / jnp.maximum(ctx_count, 1), c)
            return x, y_new, g_new, w_new, c_new

        for epoch in range(self.max_epoch):
            x, y, g, w, c = epoch_fn(x, y, g, w, c)
            if (epoch + 1) % 5 == 0 or epoch == self.max_epoch - 1:
                print(f"{self.model_name} {self.fold} epoch {epoch + 1}")
        self.U, self.V = x, y
