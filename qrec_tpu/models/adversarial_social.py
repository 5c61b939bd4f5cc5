"""Adversarial social refinement family: ESRF and RSGAN.

Reference: model/ranking/ESRF.py, model/ranking/RSGAN.py. Both learn social
structure adversarially:

* ESRF — a motif-GCN generator proposes K alternative neighbors per user via
  concrete/Gumbel-softmax selection (segmented 100 users per step to bound
  the U×U block, like the reference's OOM workaround, ESRF.py:104-113); the
  LightGCN discriminator trains in three phases (plain → social → minimax).
* RSGAN — a CDAE generator over seeded-friend one-hot rows produces virtual
  friends by Gumbel-softmax; the discriminator trains social-BPR tiers
  u: i ≻ virtual-friend-item ≻ j. Friend seeding reuses the IF_BPR
  meta-path walk + dual SGNS pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..ops import losses as L
from ..ops.spmm import spmm
from .base import GraphRecommender, SocialRecommender
from .social_graph import _dev, _l2n, _row_norm, _xavier


def gumbel_softmax(rng, logits, temperature):
    """Reference gumbel_softmax (ESRF.py:12-17): softmax first, then
    log + Gumbel noise, then temperature softmax."""
    eps = 1e-10
    u = jax.random.uniform(rng, logits.shape)
    noise = -jnp.log(-jnp.log(u + eps) + eps)
    y = jnp.log(jax.nn.softmax(logits, axis=-1) + eps) + noise
    return jax.nn.softmax(y / temperature, axis=-1)


class ESRF(SocialRecommender, GraphRecommender):
    n_layers_g = 2
    segment = 100

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.k_sel = args.get_int("-K")
        self.beta = args.get_float("-beta")
        self.n_layers_d = args.get_int("-n_layer")

    def _motif_adjacency(self) -> sp.csr_matrix:
        """S + 10-motif matrices + co-purchase(>5), row-normalized
        (ESRF.py:53-81)."""
        src, dst, _ = self.social.coo()
        s = sp.csr_matrix(
            (np.ones(len(src), dtype=np.float32), (src, dst)),
            shape=(self.num_users, self.num_users),
        )
        y = sp.csr_matrix(
            (
                np.ones_like(self.data.train_u, dtype=np.float32),
                (self.data.train_u, self.data.train_i),
            ),
            shape=(self.num_users, self.num_items),
        )
        b = s.multiply(s.T)
        u = s - b
        c1 = (u @ u).multiply(u.T)
        a1 = c1 + c1.T
        c2 = (b @ u).multiply(u.T) + (u @ b).multiply(u.T) + (u @ u).multiply(b)
        a2 = c2 + c2.T
        c3 = (b @ b).multiply(u) + (b @ u).multiply(b) + (u @ b).multiply(b)
        a3 = c3 + c3.T
        a4 = (b @ b).multiply(b)
        c5 = (u @ u).multiply(u) + (u @ u.T).multiply(u) + (u.T @ u).multiply(u)
        a5 = c5 + c5.T
        a6 = (u @ b).multiply(u) + (b @ u.T).multiply(u.T) + (u.T @ u).multiply(b)
        a7 = (u.T @ b).multiply(u.T) + (b @ u).multiply(u) + (u @ u.T).multiply(b)
        a8 = (y @ y.T).multiply(b)
        a9 = (y @ y.T).multiply(u)
        a10 = (y @ y.T).tolil()
        a10.setdiag(0)
        a10 = a10.tocsr()
        a10 = a10.multiply(a10 > 5)
        a = s + a1 + a2 + a3 + a4 + a5 + a6 + a7 + a8 + a9 + a10
        return _row_norm(a.tocsr())

    def fit(self):
        adj = self.joint_adj
        motif = _dev(self._motif_adjacency())
        nu, ni, d = self.num_users, self.num_items, self.emb_size
        seg = min(self.segment, nu)
        k_sel, beta = self.k_sel, self.beta
        n_g, n_d = self.n_layers_g, self.n_layers_d
        reg_u = self.reg_u
        ks = jax.random.split(jax.random.PRNGKey(self.seed), 4)
        d_params = self.init_embeddings("normal")
        g_params = {
            "relation_emb": (
                jax.random.truncated_normal(ks[0], -2, 2, (nu, d)) * 0.005
            ).astype(jnp.float32),
            "selector": _xavier(ks[1], (k_sel, nu)),
        }

        def alt_neighborhood(g_params, seg_start, rng):
            """(seg, U) soft multi-hot alternative neighborhoods."""
            e = g_params["relation_emb"]
            acc = e
            x = e
            for _ in range(n_g):
                x = spmm(motif, x)
                acc = acc + _l2n(x)
            emb = acc / (n_g + 1)
            seg_emb = jax.lax.dynamic_slice_in_dim(emb, seg_start, seg, 0)
            feats = jnp.dot(seg_emb, emb.T, preferred_element_type=jnp.float32)
            # concrete selector: K Gumbel-softmax draws per user summed to a
            # multi-hot vector (ESRF.py:106-113)
            alpha = feats[:, None, :] * g_params["selector"][None, :, :]
            draws = gumbel_softmax(rng, alpha, 0.2)  # (seg, K, U)
            return jnp.sum(draws, axis=1)

        def encode(d_params, social, alt, seg_start):
            ego = jnp.concatenate([d_params["user_emb"], d_params["item_emb"]])
            acc = ego
            for _ in range(n_d):
                new = spmm(adj, ego)
                if social:
                    social_emb = (
                        jnp.dot(
                            alt, ego[:nu], preferred_element_type=jnp.float32
                        )
                        / k_sel
                    )
                    users = jax.lax.dynamic_update_slice_in_dim(
                        new[:nu],
                        jax.lax.dynamic_slice_in_dim(new[:nu], seg_start, seg, 0)
                        + social_emb,
                        seg_start,
                        0,
                    )
                    ego = jnp.concatenate([users, new[nu:]])
                else:
                    ego = new
                acc = acc + _l2n(ego)
            return acc[:nu], acc[nu:]

        def d_loss_fn(d_params, g_params, batch, rng, social, adversarial):
            u, i, j, w = batch
            seg_start = jax.random.randint(
                jax.random.fold_in(rng, 3), (), 0, max(nu - seg, 1)
            )
            alt = (
                alt_neighborhood(g_params, seg_start, jax.random.fold_in(rng, 4))
                if social
                else None
            )
            users, items = encode(d_params, social, alt, seg_start)
            pu, qi, qj = users[u], items[i], items[j]
            y_ui = jnp.sum(pu * qi, axis=1)
            y_uj = jnp.sum(pu * qj, axis=1)
            loss = L.bpr_loss(y_ui, y_uj, w)
            loss = loss + reg_u * 0.5 * (
                jnp.sum(w[:, None] * pu**2)
                + jnp.sum(w[:, None] * qi**2)
                + jnp.sum(w[:, None] * qj**2)
            )
            if adversarial:
                # full-row alt needed only for batch users inside segment;
                # approximate with the segment's alt rows scattered to zero
                # elsewhere — matching the reference's zero padding
                alt_full = jnp.zeros((nu, nu)).at[
                    seg_start + jnp.arange(seg)
                ].set(alt)
                friends = (
                    jnp.dot(
                        alt_full[u], users, preferred_element_type=jnp.float32
                    )
                    / k_sel
                )
                y_vi = jnp.sum(friends * qi, axis=1)
                loss = loss + beta * L.bpr_loss(y_ui, y_vi, w)
            return loss

        def g_loss_fn(g_params, d_params, batch, rng):
            u, i, j, w = batch
            seg_start = jax.random.randint(
                jax.random.fold_in(rng, 3), (), 0, max(nu - seg, 1)
            )
            alt = alt_neighborhood(
                g_params, seg_start, jax.random.fold_in(rng, 4)
            )
            users, items = encode(d_params, True, alt, seg_start)
            pu, qi = users[u], items[i]
            y_ui = jnp.sum(pu * qi, axis=1)
            alt_full = jnp.zeros((nu, nu)).at[
                seg_start + jnp.arange(seg)
            ].set(alt)
            friends = (
                jnp.dot(alt_full[u], users, preferred_element_type=jnp.float32)
                / k_sel
            )
            y_vi = jnp.sum(friends * qi, axis=1)
            return beta * L.bpr_loss(y_vi, y_ui, w)

        d_opt = optax.adam(self.lrate)
        g_opt = optax.adam(self.lrate * 5)
        d_state = d_opt.init(d_params)
        g_state = g_opt.init(g_params)

        def make_epoch(social, adversarial):
            @jax.jit
            def run(d_params, g_params, d_state, g_state, batches, rng):
                nb = jax.tree_util.tree_leaves(batches)[0].shape[0]
                rngs = jax.random.split(rng, nb)

                def step(carry, xs):
                    d_params, g_params, d_state, g_state = carry
                    batch, r = xs
                    loss, grads = jax.value_and_grad(d_loss_fn)(
                        d_params, g_params, batch, r, social, adversarial
                    )
                    upd, d_state = d_opt.update(grads, d_state, d_params)
                    d_params = optax.apply_updates(d_params, upd)
                    if adversarial:
                        gl, ggrads = jax.value_and_grad(g_loss_fn)(
                            g_params, d_params, batch, jax.random.fold_in(r, 9)
                        )
                        gupd, g_state = g_opt.update(ggrads, g_state, g_params)
                        g_params = optax.apply_updates(g_params, gupd)
                    return (d_params, g_params, d_state, g_state), loss

                (d_params, g_params, d_state, g_state), losses = jax.lax.scan(
                    step, (d_params, g_params, d_state, g_state), (batches, rngs)
                )
                return d_params, g_params, d_state, g_state, jnp.sum(losses)

            return run

        sampler = self.pairwise_sampler()
        rng = jax.random.PRNGKey(self.seed + 1)
        third = max(1, self.max_epoch // 3)
        for phase, (social, adversarial) in enumerate(
            [(False, False), (True, False), (True, True)]
        ):
            run = make_epoch(social, adversarial)
            print(
                ["pretraining...", "normal training with social relations...",
                 "adversarial training..."][phase]
            )
            for epoch in range(third):
                rng, rs, re = jax.random.split(rng, 3)
                batches = sampler(rs)
                d_params, g_params, d_state, g_state, loss = run(
                    d_params, g_params, d_state, g_state, batches, re
                )
            print(
                f"{self.model_name} {self.fold} phase {phase + 1}: "
                f"loss = {float(loss):.4f}"
            )

        @jax.jit
        def final(d_params):
            return encode(d_params, False, None, 0)

        self.U, self.V = final(d_params)


class RSGAN(SocialRecommender):
    """Social GAN with a Gumbel-softmax CDAE generator of virtual friends
    (RSGAN.py). Seeded friends come from the IF_BPR meta-path pipeline."""

    hidden = 200
    seed_top_k = 100
    seed_keep = 30

    def read_configuration(self):
        super().read_configuration()

    def _seeded_friends(self):
        """true friends + top-30 positive implicit friends
        (RSGAN.py:221-224), via the IF_BPR meta-path walk machinery."""
        from .ifbpr import IF_BPR

        helper = IF_BPR.__new__(IF_BPR)
        helper.__dict__.update(self.__dict__)
        helper.walk_length = 20
        helper.walk_dim = 32
        helper.win_size = 5
        helper.top_k = min(self.seed_top_k, self.num_users - 1)
        p_ids, p_sims, n_ids, _, _, _ = IF_BPR._friend_lists(helper)
        nu = self.num_users
        seeds = sp.lil_matrix((nu, nu), dtype=np.float32)
        for u in range(nu):
            chosen = set(p_ids[u][: self.seed_keep].tolist())
            if n_ids is not None:
                chosen |= set(p_ids[u]) & set(n_ids[u])
            for f in chosen:
                seeds[u, int(f)] = 1.0
        return seeds.tocsr()

    def fit(self):
        seeds = self._seeded_friends()
        profiles = jnp.asarray(seeds.toarray())
        nu, ni, d = self.num_users, self.num_items, self.emb_size
        h = self.hidden
        ks = jax.random.split(jax.random.PRNGKey(self.seed), 6)
        g_params = {
            "V": _xavier(ks[0], (nu, h)),
            "enc_w": _xavier(ks[1], (nu, h)),
            "enc_b": jnp.zeros(h),
            "dec_w": _xavier(ks[2], (h, nu)),
            "dec_b": jnp.zeros(nu),
            "item_selection": jnp.full((nu, ni), 0.01),
        }
        d_params = self.init_embeddings("normal")
        # item → user rating matrix for candidate items (RSGAN.py:231-233)
        iu = sp.csr_matrix(
            (
                self.data.train_r,
                (self.data.train_i, self.data.train_u),
            ),
            shape=(ni, nu),
        )
        iu_dev = _dev(iu)
        reg_u = self.reg_u

        def generator(g_params, x, uids):
            layer = jax.nn.sigmoid(
                x @ g_params["enc_w"] + g_params["enc_b"] + g_params["V"][uids]
            )
            return jax.nn.sigmoid(layer @ g_params["dec_w"] + g_params["dec_b"])

        def recon_loss_fn(g_params, x, uids):
            out = generator(g_params, x, uids)
            pred = jnp.maximum(1e-6, x * out)
            ce = -x * jnp.log(pred) - (1 - x) * jnp.log(
                jnp.maximum(1 - pred, 1e-6)
            )
            reg = reg_u * 0.5 * (
                jnp.sum(g_params["enc_w"] ** 2) + jnp.sum(g_params["dec_w"] ** 2)
                + jnp.sum(g_params["enc_b"] ** 2) + jnp.sum(g_params["dec_b"] ** 2)
            )
            return jnp.sum(ce) + reg

        def virtual_item_emb(g_params, d_params, x, uids, rng):
            out = generator(g_params, x, uids)
            r1, r2 = jax.random.split(rng)
            vf = gumbel_softmax(r1, out, 0.1)  # virtual friends (B, U)
            cand = spmm(iu_dev, vf.T).T  # (B, I) candidate items
            sel = cand * g_params["item_selection"][uids]
            vi = gumbel_softmax(r2, sel, 0.1)  # virtual items (B, I)
            return vi @ d_params["item_emb"]

        def d_loss_fn(d_params, g_params, batch, rng):
            u, i, j, w = batch
            pu = d_params["user_emb"][u]
            qi = d_params["item_emb"][i]
            qj = d_params["item_emb"][j]
            vie = jax.lax.stop_gradient(
                virtual_item_emb(g_params, d_params, profiles[u], u, rng)
            )
            y_uf = jnp.sum(pu * qi, axis=1) - jnp.sum(pu * vie, axis=1)
            y_fs = jnp.sum(pu * vie, axis=1) - jnp.sum(pu * qj, axis=1)
            loss = L.bpr_loss(y_uf, jnp.zeros_like(y_uf), w) + L.bpr_loss(
                y_fs, jnp.zeros_like(y_fs), w
            )
            reg = reg_u * 0.5 * (
                jnp.sum(w[:, None] * pu**2)
                + jnp.sum(w[:, None] * qi**2)
                + jnp.sum(w[:, None] * qj**2)
            )
            return loss + reg

        def g_loss_fn(g_params, d_params, batch, rng):
            u, i, j, w = batch
            pu = jax.lax.stop_gradient(d_params["user_emb"][u])
            qi = jax.lax.stop_gradient(d_params["item_emb"][i])
            vie = virtual_item_emb(g_params, d_params, profiles[u], u, rng)
            y_uf = jnp.sum(pu * qi, axis=1) - jnp.sum(pu * vie, axis=1)
            return 30.0 * jnp.sum(w * y_uf)

        g_opt = optax.adam(self.lrate)
        d_opt = optax.adam(self.lrate)
        g_state = g_opt.init(g_params)
        d_state = d_opt.init(d_params)

        # --- generator pretraining (30 passes, RSGAN.py:344-349) ---
        uids_all = jnp.arange(nu, dtype=jnp.int32)

        @jax.jit
        def g_pre_step(g_params, g_state):
            loss, grads = jax.value_and_grad(recon_loss_fn)(
                g_params, profiles, uids_all
            )
            upd, g_state = g_opt.update(grads, g_state, g_params)
            return optax.apply_updates(g_params, upd), g_state, loss

        print("pretraining for generator...")
        for _ in range(30):
            g_params, g_state, _ = g_pre_step(g_params, g_state)

        @jax.jit
        def run_epoch(d_params, g_params, d_state, g_state, batches, rng):
            nb = jax.tree_util.tree_leaves(batches)[0].shape[0]
            rngs = jax.random.split(rng, nb)

            def step(carry, xs):
                d_params, g_params, d_state, g_state = carry
                batch, r = xs
                gl, ggrads = jax.value_and_grad(g_loss_fn)(
                    g_params, d_params, batch, r
                )
                gupd, g_state = g_opt.update(ggrads, g_state, g_params)
                g_params = optax.apply_updates(g_params, gupd)
                dl, dgrads = jax.value_and_grad(d_loss_fn)(
                    d_params, g_params, batch, jax.random.fold_in(r, 1)
                )
                dupd, d_state = d_opt.update(dgrads, d_state, d_params)
                d_params = optax.apply_updates(d_params, dupd)
                return (d_params, g_params, d_state, g_state), dl

            (d_params, g_params, d_state, g_state), losses = jax.lax.scan(
                step, (d_params, g_params, d_state, g_state), (batches, rngs)
            )
            return d_params, g_params, d_state, g_state, jnp.sum(losses)

        print("Training GAN...")
        sampler = self.pairwise_sampler()
        rng = jax.random.PRNGKey(self.seed + 1)
        for epoch in range(self.max_epoch):
            rng, rs, re = jax.random.split(rng, 3)
            batches = sampler(rs)
            d_params, g_params, d_state, g_state, loss = run_epoch(
                d_params, g_params, d_state, g_state, batches, re
            )
            if (epoch + 1) % 5 == 0 or epoch == self.max_epoch - 1:
                print(
                    f"{self.model_name} {self.fold} epoch {epoch + 1}: "
                    f"D_loss = {float(loss):.4f}"
                )
        self.U = d_params["user_emb"]
        self.V = d_params["item_emb"]
