"""Deep CF family: NeuMF, DMF, CDAE, CFGAN, APR (IRGAN in gan.py).

Reference: model/ranking/NeuMF.py, DMF.py, CDAE.py, CFGAN.py, APR.py. The
TF1 session graphs become pure-jnp forward functions; staged/alternating
schedules are sequences of jitted phases over the shared trainer.

Sampling-divergence note: the dense-input models (DMF/CDAE/CFGAN) draw their
negative/corruption masks as Bernoulli masks with matching expected counts on
device, replacing the reference's per-entry host rejection loops (e.g.
CDAE.py:23-43) — the mask distribution is binomial in both cases; only the
exact-count conditioning differs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .base import IterativeRecommender, TrainSpec

_EPS = 10e-10


def _xavier(rng, shape):
    return jax.nn.initializers.glorot_uniform()(rng, shape, jnp.float32)


class NeuMF(IterativeRecommender):
    """GMF + 3-layer MLP with staged pretraining: GMF (maxEpoch), MLP
    (maxEpoch//2), fused NeuMF (maxEpoch//5) (NeuMF.py:79-100)."""

    eval_batch_size = 32

    def _init_params(self):
        rng = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(rng, 10)
        d = self.emb_size
        return {
            "PG": _xavier(ks[0], (self.num_users, d)),
            "QG": _xavier(ks[1], (self.num_items, d)),
            "PM": _xavier(ks[2], (self.num_users, d)),
            "QM": _xavier(ks[3], (self.num_items, d)),
            "h_mf": _xavier(ks[4], (d, 1))[:, 0],
            "h_mlp": _xavier(ks[5], (d, 1))[:, 0],
            "W1": _xavier(ks[6], (2 * d, 5 * d)),
            "b1": jnp.zeros(5 * d),
            "W2": _xavier(ks[7], (5 * d, 2 * d)),
            "b2": jnp.zeros(2 * d),
            "W3": _xavier(ks[8], (2 * d, d)),
            "b3": jnp.zeros(d),
        }

    @staticmethod
    def _mlp_tower(params, um, im):
        h = jnp.concatenate([um, im], axis=-1)
        h = jax.nn.relu(h @ params["W1"] + params["b1"])
        h = jax.nn.relu(h @ params["W2"] + params["b2"])
        return jax.nn.relu(h @ params["W3"] + params["b3"])

    def _losses(self):
        reg_u = self.reg_u

        def y_mf(params, u, i):
            gmf = params["PG"][u] * params["QG"][i]
            return jax.nn.sigmoid(gmf @ params["h_mf"])

        def y_mlp(params, u, i):
            mlp = self._mlp_tower(params, params["PM"][u], params["QM"][i])
            return jax.nn.sigmoid(mlp @ params["h_mlp"])

        def y_neu(params, u, i):
            gmf = params["PG"][u] * params["QG"][i]
            mlp = self._mlp_tower(params, params["PM"][u], params["QM"][i])
            return jax.nn.sigmoid(
                0.5 * (gmf @ params["h_mf"]) + 0.5 * (mlp @ params["h_mlp"])
            )

        def ce(y, r, w):
            return -jnp.sum(
                w * (r * jnp.log(y + _EPS) + (1 - r) * jnp.log(1 - y + _EPS))
            )

        def mf_reg(params, u, i):
            return reg_u * (
                0.5 * jnp.sum(params["PG"][u] ** 2)
                + 0.5 * jnp.sum(params["QG"][i] ** 2)
                + 0.5 * jnp.sum(params["h_mf"] ** 2)
            )

        def loss_mf(params, batch, rng):
            u, i, r, w = batch
            return ce(y_mf(params, u, i), r, w) + mf_reg(params, u, i)

        def loss_mlp(params, batch, rng):
            u, i, r, w = batch
            return ce(y_mlp(params, u, i), r, w)

        def loss_neu(params, batch, rng):
            u, i, r, w = batch
            h_neu = jnp.concatenate([0.5 * params["h_mf"], 0.5 * params["h_mlp"]])
            reg = mf_reg(params, u, i) + reg_u * 0.5 * jnp.sum(h_neu**2)
            return ce(y_neu(params, u, i), r, w) + reg

        return y_neu, loss_mf, loss_mlp, loss_neu

    def fit(self):
        params = self._init_params()
        y_neu, loss_mf, loss_mlp, loss_neu = self._losses()
        sampler = self.pointwise_sampler()
        print("pretraining... (GMF)")
        params = self.run_training(
            params, loss_mf, sampler, mode="adam", track_best=False
        )
        print("pretraining... (MLP)")
        params = self.run_training(
            params, loss_mlp, sampler, mode="adam", track_best=False,
            max_epoch=max(1, self.max_epoch // 2),
        )
        print("training... (NeuMF)")
        params = self.run_training(
            params, loss_neu, sampler, mode="adam", track_best=False,
            max_epoch=max(1, self.max_epoch // 5),
        )
        self.params = params
        self._y_neu = y_neu

    def score_fn_params(self):
        y_neu = self._y_neu
        num_items = self.num_items

        def score_fn(params, uids):
            def per_user(u):
                items = jnp.arange(num_items, dtype=jnp.int32)
                return y_neu(params, jnp.full_like(items, u), items)

            return jax.vmap(per_user)(uids)

        return score_fn, self.params

    def predict_ratings(self, users, items):
        uids, iids = self._ids(users, items)
        dot = np.asarray(
            self._y_neu(
                self.params,
                jnp.asarray(np.maximum(uids, 0)),
                jnp.asarray(np.maximum(iids, 0)),
            )
        )
        return self._mean_fallback(uids, iids, dot)


class DMF(IterativeRecommender):
    """Deep matrix factorization: dual MLP towers over raw rating rows/cols
    with cosine scoring and normalized CE (DMF.py:44-115)."""

    hidden = (256, 512)
    negative_sp = 5

    def build(self):
        rng = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(rng, 6)
        h1, h2 = self.hidden
        params = {
            "uW1": _xavier(ks[0], (self.num_items, h1)),
            "uW2": _xavier(ks[1], (h1, h2)),
            "ub2": _xavier(ks[2], (1, h2))[0],
            "iW1": _xavier(ks[3], (self.num_users, h1)),
            "iW2": _xavier(ks[4], (h1, h2)),
            "ib2": _xavier(ks[5], (1, h2))[0],
        }
        r_dense = self.dense_ratings()
        r_dense_t = jnp.asarray(np.asarray(r_dense).T)  # item rows, cached
        reg_u = self.reg_u
        ta = self.train_arrays
        n = self.train_size
        bs = self.batch_size
        neg = self.negative_sp
        num_users, num_items = self.num_users, self.num_items
        num_batches = max(1, n // bs)

        def user_tower(params, rows):
            h = jax.nn.relu(rows @ params["uW1"])
            return jax.nn.relu(h @ params["uW2"] + params["ub2"])

        def item_tower(params, cols):
            h = jax.nn.relu(cols @ params["iW1"])
            return jax.nn.relu(h @ params["iW2"] + params["ib2"])

        self._towers = (user_tower, item_tower)

        @partial(jax.jit)
        def sampler(rng):
            perm = jax.random.permutation(rng, n)[: num_batches * bs]
            u_pos, i_pos = ta["u"][perm], ta["i"][perm]
            r_pos = ta["r"][perm]
            ru, ri = jax.random.split(jax.random.fold_in(rng, 1))
            u_neg = jax.random.randint(ru, (num_batches * bs * neg,), 0, num_users)
            i_neg = jax.random.randint(ri, (num_batches * bs * neg,), 0, num_items)
            shape_p = (num_batches, bs)
            shape_n = (num_batches, bs * neg)
            return (
                u_pos.reshape(shape_p), i_pos.reshape(shape_p),
                r_pos.reshape(shape_p),
                u_neg.astype(jnp.int32).reshape(shape_n),
                i_neg.astype(jnp.int32).reshape(shape_n),
            )

        def loss_fn(params, batch, rng):
            u_pos, i_pos, r_pos, u_neg, i_neg = batch
            u = jnp.concatenate([u_pos, u_neg])
            i = jnp.concatenate([i_pos, i_neg])
            r = jnp.concatenate([r_pos, jnp.zeros_like(u_neg, dtype=jnp.float32)])
            rows = r_dense[u]
            cols = r_dense_t[i]
            uo = user_tower(params, rows)
            io = item_tower(params, cols)
            cos = jnp.sum(uo * io, axis=1) / (
                jnp.linalg.norm(uo, axis=1) * jnp.linalg.norm(io, axis=1) + 1e-12
            )
            y = jnp.maximum(1e-6, cos)
            # reference feeds raw ratings as targets (DMF.py:85)
            ce = -jnp.sum(r * jnp.log(y) + (1 - r) * jnp.log(jnp.maximum(1 - y, 1e-6)))
            reg = reg_u * 0.5 * sum(
                jnp.sum(params[k] ** 2) for k in ("uW1", "uW2", "ub2", "iW1", "iW2", "ib2")
            )
            return ce + reg

        return TrainSpec(
            params, loss_fn, sampler, mode="adam", track_best=False,
            score_params_fn=None,
        )

    def finalize(self, params, spec):
        user_tower, item_tower = self._towers
        r_dense = self.dense_ratings()
        self.U = jax.jit(user_tower)(params, r_dense)
        self.V = jax.jit(item_tower)(params, jnp.asarray(np.asarray(r_dense).T))
        self.final_params = params

    def score_fn_params(self):
        def score_fn(params, uids):
            u = params["user_emb"][uids]
            v = params["item_emb"]
            dots = jnp.dot(u, v.T, preferred_element_type=jnp.float32)
            nu = jnp.linalg.norm(u, axis=1, keepdims=True)
            nv = jnp.linalg.norm(v, axis=1)[None, :]
            return dots / (nu * nv + 1e-12)

        return score_fn, {"user_emb": self.U, "item_emb": self.V}


class CDAE(IterativeRecommender):
    """Collaborative denoising autoencoder with per-user input bias embedding
    (CDAE.py:13-96). One random user batch per epoch, like the reference."""

    negative_sp = 5

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.corruption_level = args.get_float("-co")
        self.n_hidden = args.get_int("-nh")

    def build(self):
        rng = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(rng, 5)
        params = {
            "V": _xavier(ks[0], (self.num_users, self.n_hidden)),
            "enc_w": _xavier(ks[1], (self.num_items, self.n_hidden)),
            "enc_b": _xavier(ks[2], (1, self.n_hidden))[0],
            "dec_w": _xavier(ks[3], (self.n_hidden, self.num_items)),
            "dec_b": _xavier(ks[4], (1, self.num_items))[0],
        }
        r_dense = self.dense_ratings()
        rated = (r_dense > 0).astype(jnp.float32)
        deg = jnp.sum(rated, axis=1)
        reg_u = self.reg_u
        bs = self.batch_size
        num_users, num_items = self.num_users, self.num_items
        neg_sp, corruption = self.negative_sp, self.corruption_level

        def forward(params, x, uids, mask):
            corrupted = mask * x
            enc = jax.nn.sigmoid(
                corrupted @ params["enc_w"] + params["enc_b"] + params["V"][uids]
            )
            return jax.nn.sigmoid(enc @ params["dec_w"] + params["dec_b"])

        self._forward = forward

        @jax.jit
        def sampler(rng):
            r1, r2, r3 = jax.random.split(rng, 3)
            uids = jax.random.randint(r1, (1, bs), 0, num_users, dtype=jnp.int32)
            # corruption mask: keep with prob corruption_level (the reference
            # multiplies by binomial(1, corruption_level) — CDAE.py:90-92)
            mask = jax.random.bernoulli(r2, corruption, (1, bs, num_items))
            # negatives: Bernoulli with expected count 5*deg(u) over non-rated
            p = jnp.clip(neg_sp * deg[uids[0]] / num_items, 0.0, 1.0)
            negm = jax.random.bernoulli(r3, p[:, None], (1, bs, num_items))
            return uids, mask.astype(jnp.float32), negm.astype(jnp.float32)

        def loss_fn(params, batch, rng):
            uids, mask, negm = batch
            x = r_dense[uids]
            pos = rated[uids]
            negative = negm * (1 - pos)
            pred = forward(params, x, uids, mask)
            pred = jnp.maximum(1e-6, pred * mask)
            y_pos = pos * mask
            y_neg = negative * mask
            ce = -y_pos * jnp.log(pred) - y_neg * jnp.log(
                jnp.maximum(1 - pred, 1e-6)
            )
            reg = reg_u * 0.5 * (
                jnp.sum(params["enc_w"] ** 2) + jnp.sum(params["dec_w"] ** 2)
                + jnp.sum(params["enc_b"] ** 2) + jnp.sum(params["dec_b"] ** 2)
                + jnp.sum(params["V"][uids] ** 2)
            )
            return jnp.mean(ce) + reg

        return TrainSpec(
            params, loss_fn, sampler, mode="adam", track_best=False
        )

    def finalize(self, params, spec):
        self.params = params
        self.final_params = params

    def score_fn_params(self):
        forward = self._forward
        r_dense = self.dense_ratings()

        def score_fn(params, uids):
            x = r_dense[uids]
            return forward(params, x, uids, jnp.ones_like(x))

        return score_fn, self.params


def cfgan_fns(alpha):
    """CFGAN generator/discriminator and losses (CFGAN.py:46-127), exposed at
    module level for golden-value testing: G is a one-layer sigmoid decoder
    over the condition row; D scores [x, c]; the G loss combines the
    non-saturating log(1-D(fake)) term with the zero-reconstruction penalty
    alpha/2·Σ(n_zr·fake)², and `mask` carries the partial-masking scheme
    (positives + s_pm random non-rated columns)."""

    def gen(g_params, c):
        return jax.nn.sigmoid(c @ g_params["W1"] + g_params["b1"])

    def disc(d_params, x, c):
        return jax.nn.sigmoid(
            jnp.concatenate([x, c], axis=1) @ d_params["W1"] + d_params["b1"]
        )

    def d_loss_fn(d_params, g_params, c, mask, n_zr):
        fake = gen(g_params, c) * mask
        d_real = disc(d_params, c, c)
        d_fake = disc(d_params, fake, c)
        return -jnp.mean(
            jnp.log(d_real + 10e-5) + jnp.log(1.0 - d_fake + 10e-5)
        )

    def g_loss_fn(g_params, d_params, c, mask, n_zr):
        fake = gen(g_params, c) * mask
        d_fake = disc(d_params, fake, c)
        zr = alpha * 0.5 * jnp.sum((n_zr * fake) ** 2)
        return jnp.mean(jnp.log(1.0 - d_fake + 10e-5)) + zr

    return gen, disc, d_loss_fn, g_loss_fn


class CFGAN(IterativeRecommender):
    """Conditional GAN over full rating vectors with zero-reconstruction and
    partial-masking negatives (CFGAN.py). One batch per epoch; 1 D step then
    3 G steps (CFGAN.py:119-127)."""

    s_zr = 0.001
    s_pm = 0.001
    alpha = 0.01

    def fit(self):
        rng = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(rng, 4)
        g_params = {
            "W1": _xavier(ks[0], (self.num_items, self.num_items)),
            "b1": jnp.zeros(self.num_items),
        }
        d_params = {
            "W1": _xavier(ks[1], (self.num_items * 2, 1)),
            "b1": jnp.zeros(1),
        }
        r_dense = self.dense_ratings()
        rated = (r_dense > 0).astype(jnp.float32)
        bs = self.batch_size
        num_users, num_items = self.num_users, self.num_items
        s_zr, s_pm = self.s_zr, self.s_pm

        gen, disc, d_loss_fn, g_loss_fn = cfgan_fns(self.alpha)
        self._gen = gen

        def batch_data(rng):
            r1, r2, r3 = jax.random.split(rng, 3)
            uids = jax.random.randint(r1, (bs,), 0, num_users, dtype=jnp.int32)
            c = r_dense[uids]
            pos = rated[uids]
            n_zr = jax.random.bernoulli(r2, s_zr, c.shape) * (1 - pos)
            extra = jax.random.bernoulli(r3, s_pm, c.shape) * (1 - pos)
            mask = pos + extra
            return c, mask.astype(jnp.float32), n_zr.astype(jnp.float32)

        d_opt = optax.adam(self.lrate)
        g_opt = optax.adam(self.lrate)
        d_state = d_opt.init(d_params)
        g_state = g_opt.init(g_params)

        @jax.jit
        def epoch(g_params, d_params, g_state, d_state, rng):
            c, mask, n_zr = batch_data(rng)
            dl, dg = jax.value_and_grad(d_loss_fn)(d_params, g_params, c, mask, n_zr)
            upd, d_state = d_opt.update(dg, d_state, d_params)
            d_params = optax.apply_updates(d_params, upd)

            def g_step(carry, _):
                g_params, g_state = carry
                gl, gg = jax.value_and_grad(g_loss_fn)(
                    g_params, d_params, c, mask, n_zr
                )
                upd, g_state = g_opt.update(gg, g_state, g_params)
                return (optax.apply_updates(g_params, upd), g_state), gl

            (g_params, g_state), gls = jax.lax.scan(
                g_step, (g_params, g_state), None, length=3
            )
            return g_params, d_params, g_state, d_state, dl, gls[-1]

        rng = jax.random.PRNGKey(self.seed + 1)
        for ep in range(self.max_epoch):
            rng, sub = jax.random.split(rng)
            g_params, d_params, g_state, d_state, dl, gl = epoch(
                g_params, d_params, g_state, d_state, sub
            )
            if (ep + 1) % 20 == 0 or ep == self.max_epoch - 1:
                print(
                    f"{self.model_name} {self.fold} epoch {ep + 1}: "
                    f"D_loss = {float(dl):.4f} G_loss = {float(gl):.4f}"
                )
        self.g_params = g_params

    def score_fn_params(self):
        gen = self._gen
        r_dense = self.dense_ratings()

        def score_fn(params, uids):
            return gen(params, r_dense[uids])

        return score_fn, self.g_params


class APR(IterativeRecommender):
    """Adversarial personalized ranking: BPR pretrain then FGSM-style
    embedding perturbations Δ = ε·normalize(∇) (APR.py:43-53,100-121)."""

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.eps = args.get_float("-eps")
        self.reg_adv = args.get_float("-regA")
        self.adv_epoch = args.get_int("-advEpoch")

    def fit(self):
        params = self.init_embeddings("normal")
        reg_u, eps, reg_adv = self.reg_u, self.eps, self.reg_adv

        def softplus_bpr(pu, qi, qj, w):
            y = jnp.sum(pu * qi, axis=1) - jnp.sum(pu * qj, axis=1)
            return jnp.sum(w * jax.nn.softplus(-y))

        def base_loss(params, batch, rng):
            u, i, j, w = batch
            pu, qi, qj = params["user_emb"][u], params["item_emb"][i], params["item_emb"][j]
            reg = reg_u * 0.5 * (jnp.sum(pu**2) + jnp.sum(qi**2))
            return softplus_bpr(pu, qi, qj, w) + reg

        def adv_loss(params, batch, rng):
            u, i, j, w = batch
            pu, qi, qj = params["user_emb"][u], params["item_emb"][i], params["item_emb"][j]
            loss = softplus_bpr(pu, qi, qj, w)
            reg = reg_u * 0.5 * (jnp.sum(pu**2) + jnp.sum(qi**2))
            # FGSM deltas on the batch embeddings, gradients stopped
            gu, gi, gj = jax.grad(softplus_bpr, argnums=(0, 1, 2))(pu, qi, qj, w)

            def norm_rows(g):
                return g / (jnp.linalg.norm(g, axis=1, keepdims=True) + 1e-12)

            du = jax.lax.stop_gradient(norm_rows(gu)) * eps
            di = jax.lax.stop_gradient(norm_rows(gi)) * eps
            dj = jax.lax.stop_gradient(norm_rows(gj)) * eps
            adv = softplus_bpr(pu + du, qi + di, qj + dj, w)
            return loss + reg + reg_adv * adv

        sampler = self.pairwise_sampler()
        print("pretraining...")
        params = self.run_training(
            params, base_loss, sampler, mode="adam", track_best=False,
            max_epoch=max(1, self.max_epoch // 2),
        )
        print("adversarial training...")
        params = self.run_training(
            params, adv_loss, sampler, mode="adam", track_best=False,
            max_epoch=max(1, self.max_epoch // 2),
        )
        self.U = params["user_emb"]
        self.V = params["item_emb"]
