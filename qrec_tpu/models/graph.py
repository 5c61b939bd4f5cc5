"""Graph CF family: LightGCN, NGCF, SGL, SimGCL.

Reference: model/ranking/LightGCN.py, NGCF.py, SGL.py, SimGCL.py. All share
the joint normalized adjacency and the device SpMM propagation path; the SSL
members express graph augmentation as on-device masked+renormalized edge
values (ops/spmm.subgraph_vals) instead of the reference's per-epoch host
scipy rebuilds (SGL.py:233-250).

Divergence note: augmented views are resampled per optimization step from the
step PRNG rather than once per epoch — on TPU the mask+renormalize is
essentially free, and fresher views only strengthen the contrastive signal.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..data.graph import joint_bipartite_coo
from ..ops import losses as L
from ..ops.spmm import (
    DenseJoint,
    factored_edge_drop_view,
    factored_node_drop_view,
    factored_view_matmul,
    join_consts,
    lightgcn_propagate,
    split_consts,
    spmm,
    subgraph_vals,
    view_adjacency,
)
from .base import GraphRecommender, TrainSpec


def _l2(x, w=None):
    """tf.nn.l2_loss semantics: sum(x**2)/2 (optionally row-weighted)."""
    if w is None:
        return 0.5 * jnp.sum(x**2)
    return 0.5 * jnp.sum(w[:, None] * x**2)


class LightGCN(GraphRecommender):
    """K-layer linear propagation with layer-mean readout + BPR
    (LightGCN.py:11-41).

    The adjacency arrays ride ``TrainSpec.consts`` (jit arguments, see
    ops/spmm.split_consts) so north-star-scale dense tables never embed in
    the serialized HLO — this is what lets yelp-scale graphs stay on the
    dense-MXU path under the axon tunnel instead of the gather-bound
    sparse path."""

    track_best = False
    threads_adj_consts = True

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.n_layers = args.get_int("-n_layer", 2) if args else 2

    def _encoder(self):
        adj_t, adj_c = split_consts(self.joint_adj)
        self._adj_consts = {"adj": adj_c}
        nu = self.num_users
        n_layers = self.n_layers

        def encode(params, consts, vals=None):
            adj = join_consts(adj_t, consts["adj"])
            ego = jnp.concatenate([params["user_emb"], params["item_emb"]])
            out = lightgcn_propagate(adj, ego, n_layers, vals)
            return out[:nu], out[nu:]

        return encode

    def build(self):
        params = self.init_embeddings("normal")
        encode = self._encoder()
        reg_u = self.reg_u

        def loss_fn(params, batch, rng, consts):
            u, i, j, w = batch
            users, items = encode(params, consts)
            pu, qi, qj = users[u], items[i], items[j]
            pos = jnp.sum(pu * qi, axis=1)
            neg = jnp.sum(pu * qj, axis=1)
            loss = L.bpr_loss(pos, neg, w)
            reg = reg_u * (_l2(pu, w) + _l2(qi, w) + _l2(qj, w))
            return loss + reg

        def score_params(params, consts):
            users, items = encode(params, consts)
            return {"user_emb": users, "item_emb": items}

        return TrainSpec(
            params,
            loss_fn,
            self.pairwise_sampler(),
            mode="adam",
            track_best=self.track_best,
            score_params_fn=jax.jit(score_params),
            consts=self._adj_consts,
        )


class NGCF(GraphRecommender):
    """Graph CF with W1/W2 transforms, bi-interaction, message dropout, and
    L2-normalized layer concat (NGCF.py:9-63)."""

    track_best = False
    threads_adj_consts = True
    n_layers = 2  # fixed in the reference (NGCF.py:19)
    keep_prob = 0.9  # message dropout keep (NGCF.py:37)

    def build(self):
        params = self.init_embeddings("normal")
        init = jax.nn.initializers.glorot_uniform()
        rng = jax.random.PRNGKey(self.seed + 17)
        d = self.emb_size
        for k in range(self.n_layers):
            rng, r1, r2 = jax.random.split(rng, 3)
            params[f"W_{k}_1"] = init(r1, (d, d), jnp.float32)
            params[f"W_{k}_2"] = init(r2, (d, d), jnp.float32)
        adj_t, adj_c = split_consts(self.joint_adj)
        consts = {"adj": adj_c}
        nu = self.num_users
        n_layers, keep_prob = self.n_layers, self.keep_prob
        reg_u = self.reg_u

        def encode(params, consts, rng=None):
            adj = join_consts(adj_t, consts["adj"])
            ego = jnp.concatenate([params["user_emb"], params["item_emb"]])
            layers = [ego]
            for k in range(n_layers):
                side = spmm(adj, ego)
                summed = jnp.dot(
                    side + ego, params[f"W_{k}_1"],
                    preferred_element_type=jnp.float32,
                )
                bi = jnp.dot(
                    ego * side, params[f"W_{k}_2"],
                    preferred_element_type=jnp.float32,
                )
                ego = jax.nn.leaky_relu(summed + bi)
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                    mask = jax.random.bernoulli(sub, keep_prob, ego.shape)
                    ego = jnp.where(mask, ego / keep_prob, 0.0)
                norm = ego / (
                    jnp.linalg.norm(ego, axis=1, keepdims=True) + 1e-12
                )
                layers.append(norm)
            out = jnp.concatenate(layers, axis=1)
            return out[:nu], out[nu:]

        def loss_fn(params, batch, rng, consts):
            u, i, j, w = batch
            users, items = encode(params, consts, rng)
            pu, qi, qj = users[u], items[i], items[j]
            pos = jnp.sum(pu * qi, axis=1)
            neg = jnp.sum(pu * qj, axis=1)
            loss = L.bpr_loss(pos, neg, w)
            reg = reg_u * (_l2(pu, w) + _l2(qi, w) + _l2(qj, w))
            return loss + reg

        def score_params(params, consts):
            users, items = encode(params, consts, None)
            return {"user_emb": users, "item_emb": items}

        return TrainSpec(
            params,
            loss_fn,
            self.pairwise_sampler(),
            mode="adam",
            track_best=self.track_best,
            score_params_fn=jax.jit(score_params),
            consts=consts,
        )


class SGL(GraphRecommender):
    """Self-supervised graph learning: LightGCN + contrastive node/edge-drop
    views + merged-batch InfoNCE (SGL.py).

    View backends: on the factored dense adjacency (the TPU default) the
    augmented views are MASKED FACTORED MATMULS — edge dropout is a dense
    Bernoulli mask fused into the binary int8 tables, node dropout folds
    into the renormalized scales with no materialization at all
    (ops/spmm.factored_*_view) — so views ride the same MXU path as the
    main propagation instead of the gather-bound sparse path. Non-dense
    backends keep the per-edge masked-value COO/pallas path."""

    threads_adj_consts = True

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.ssl_reg = args.get_float("-lambda")
        self.drop_rate = args.get_float("-droprate")
        self.aug_type = args.get_int("-augtype")
        self.ssl_temp = args.get_float("-temp")
        self.n_layers = args.get_int("-n_layer")

    def build(self):
        params = self.init_embeddings("normal")
        adj_full = self.joint_adj
        adj_t, adj_c = split_consts(adj_full)
        consts = {"adj": adj_c}
        nu = self.num_users
        n_layers = self.n_layers
        reg_u, ssl_reg, temp = self.reg_u, self.ssl_reg, self.ssl_temp
        drop_rate, aug_type = self.drop_rate, self.aug_type
        # merged contrastive batch = unique users + unique items per step
        ssl_backend, ssl_interp = L.resolve_ssl_backend(
            self.config, 2 * self.batch_size, self.mesh
        )
        ssl_mesh = self.mesh
        dense_views = (
            isinstance(adj_full, DenseJoint) and adj_full.col_scale is not None
        )

        if dense_views:
            def encode_view(params, consts, rng):
                adj = join_consts(adj_t, consts["adj"])
                q8, q8_t = adj.q8, adj.q8_t
                ego = jnp.concatenate(
                    [params["user_emb"], params["item_emb"]]
                )
                acc, e = ego, ego
                if aug_type == 0:
                    view = factored_node_drop_view(rng, q8, q8_t, drop_rate)
                else:
                    view = factored_edge_drop_view(rng, q8, q8_t, drop_rate)
                for k in range(n_layers):
                    if aug_type == 2:
                        # random-walk aug: fresh subgraph per layer
                        view = factored_edge_drop_view(
                            jax.random.fold_in(rng, k), q8, q8_t, drop_rate
                        )
                    e = factored_view_matmul(*view, e)
                    acc = acc + e
                out = acc / (n_layers + 1)
                return out[:nu], out[nu:]
        else:
            rows, cols, edge_ids, n_nodes = joint_bipartite_coo(self.data)
            rows_d, cols_d = jnp.asarray(rows), jnp.asarray(cols)
            edge_ids_d = jnp.asarray(edge_ids)
            num_edges = int(edge_ids.max()) + 1 if len(edge_ids) else 0

            def view_vals(rng, layer):
                # aug 2 (random walk) per-layer subgraphs; 0/1 one per view
                key = jax.random.fold_in(rng, layer) if aug_type == 2 else rng
                return subgraph_vals(
                    key, rows_d, cols_d, edge_ids_d, num_edges, n_nodes, nu,
                    drop_rate, aug_type,
                )

            # fixed symmetric structure, per-view values → pallas on TPU
            view_adj = view_adjacency(
                rows, cols, n_nodes, self.config, self.mesh
            )

            def encode_view(params, consts, rng):
                ego = jnp.concatenate(
                    [params["user_emb"], params["item_emb"]]
                )
                acc, e = ego, ego
                for k in range(n_layers):
                    vals = view_vals(rng, k)
                    e = spmm(view_adj, e, vals)
                    acc = acc + e
                out = acc / (n_layers + 1)
                return out[:nu], out[nu:]

        def encode_main(params, consts):
            adj = join_consts(adj_t, consts["adj"])
            ego = jnp.concatenate([params["user_emb"], params["item_emb"]])
            out = lightgcn_propagate(adj, ego, n_layers)
            return out[:nu], out[nu:]

        def loss_fn(params, batch, rng, consts):
            u, i, j, w = batch
            users, items = encode_main(params, consts)
            pu, qi, qj = users[u], items[i], items[j]
            pos = jnp.sum(pu * qi, axis=1)
            neg = jnp.sum(pu * qj, axis=1)
            rec = L.bpr_loss(pos, neg, w) + reg_u * (
                _l2(pu, w) + _l2(qi, w) + _l2(qj, w)
            )
            r1, r2 = jax.random.split(rng)
            s1u, s1i = encode_view(params, consts, r1)
            s2u, s2i = encode_view(params, consts, r2)
            uu, um = L.unique_padded(u)
            iu, im = L.unique_padded(i)
            merge1 = jnp.concatenate([s1u[uu], s1i[iu]])
            merge2 = jnp.concatenate([s2u[uu], s2i[iu]])
            mask = jnp.concatenate([um, im])
            ssl = ssl_reg * L.infonce_dispatch(
                merge1, merge2, mask, temp, ssl_backend, ssl_interp,
                mesh=ssl_mesh,
            )
            return rec + ssl

        def score_params(params, consts):
            users, items = encode_main(params, consts)
            return {"user_emb": users, "item_emb": items}

        return TrainSpec(
            params,
            loss_fn,
            self.pairwise_sampler(),
            mode="adam",
            track_best=True,
            score_params_fn=jax.jit(score_params),
            consts=consts,
        )


class SimGCL(GraphRecommender):
    """LightGCN with uniform-noise-perturbed contrastive encoders
    (SimGCL.py:22-111). Noise: e += sign(e) * ε * l2norm(U(0,1)) per layer."""

    cl_temp = 0.2  # hard-coded in the reference (SimGCL.py:74-77)
    threads_adj_consts = True

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.cl_rate = args.get_float("-lambda")
        self.eps = args.get_float("-eps")
        self.n_layers = args.get_int("-n_layer")
        # fused 3-view propagation (encode_all) pushes (N, 3d) through
        # spmm — the dual kernel's VMEM guard must budget for that width
        self.spmm_width = 3 * self.emb_size

    def build(self):
        # xavier embedding init (SimGCL.py:42-44)
        init = jax.nn.initializers.glorot_uniform()
        r1, r2 = jax.random.split(jax.random.PRNGKey(self.seed))
        params = {
            "user_emb": init(r1, (self.num_users, self.emb_size), jnp.float32),
            "item_emb": init(r2, (self.num_items, self.emb_size), jnp.float32),
        }
        adj_t, adj_c = split_consts(self.joint_adj)
        consts = {"adj": adj_c}
        nu = self.num_users
        n_layers = self.n_layers
        reg_u, cl_rate, eps, temp = self.reg_u, self.cl_rate, self.eps, self.cl_temp
        ssl_backend, ssl_interp = L.resolve_ssl_backend(
            self.config, self.batch_size, self.mesh
        )
        ssl_mesh = self.mesh

        def encode_main(params, consts):
            # note: reference SimGCL's LightGCN_encoder averages the K
            # propagated layers WITHOUT the ego layer (SimGCL.py:22-28)
            adj = join_consts(adj_t, consts["adj"])
            e = jnp.concatenate([params["user_emb"], params["item_emb"]])
            acc = 0
            for _ in range(n_layers):
                e = spmm(adj, e)
                acc = acc + e
            out = acc / n_layers
            return out[:nu], out[nu:]

        def _perturb(e, rng, k):
            noise = jax.random.uniform(jax.random.fold_in(rng, k), e.shape)
            noise = noise / (
                jnp.linalg.norm(noise, axis=1, keepdims=True) + 1e-12
            )
            return e + jnp.sign(e) * noise * eps

        def encode_all(params, consts, ra, rb):
            """Main + two perturbed encoders in ONE propagation stream.

            All three views propagate through the SAME adjacency, so each
            layer runs one ``spmm`` on the feature-concatenated (N, 3d)
            state instead of three (N, d) passes — the propagation is
            adjacency-bandwidth-bound (PARITY.md roofline), so this cuts
            the dominant HBM traffic ~3x. Layer 1 is shared outright: the
            perturbed views differ from the main view only AFTER their
            first noise injection (SimGCL.py:30-38). Per-view noise keys
            match the unfused encoders bit-for-bit.
            """
            adj = join_consts(adj_t, consts["adj"])
            e0 = jnp.concatenate([params["user_emb"], params["item_emb"]])
            z = spmm(adj, e0)
            states = [z, _perturb(z, ra, 0), _perturb(z, rb, 0)]
            accs = list(states)
            for k in range(1, n_layers):
                zs = jnp.split(
                    spmm(adj, jnp.concatenate(states, axis=1)), 3, axis=1
                )
                states = [zs[0], _perturb(zs[1], ra, k), _perturb(zs[2], rb, k)]
                accs = [a + s for a, s in zip(accs, states)]
            outs = [a / n_layers for a in accs]
            return [(o[:nu], o[nu:]) for o in outs]

        def loss_fn(params, batch, rng, consts):
            u, i, j, w = batch
            ra, rb = jax.random.split(rng)
            (users, items), (p1u, p1i), (p2u, p2i) = encode_all(
                params, consts, ra, rb
            )
            pu, qi, qj = users[u], items[i], items[j]
            pos = jnp.sum(pu * qi, axis=1)
            neg = jnp.sum(pu * qj, axis=1)
            rec = L.bpr_loss(pos, neg, w) + reg_u * (
                _l2(pu, w) + _l2(qi, w) + _l2(qj, w)
            )
            uu, um = L.unique_padded(u)
            iu, im = L.unique_padded(i)
            cl = L.infonce_dispatch(
                p1u[uu], p2u[uu], um, temp, ssl_backend, ssl_interp,
                mesh=ssl_mesh,
            )
            cl = cl + L.infonce_dispatch(
                p1i[iu], p2i[iu], im, temp, ssl_backend, ssl_interp,
                mesh=ssl_mesh,
            )
            return rec + cl_rate * cl

        def score_params(params, consts):
            users, items = encode_main(params, consts)
            return {"user_emb": users, "item_emb": items}

        return TrainSpec(
            params,
            loss_fn,
            self.pairwise_sampler(),
            mode="adam",
            track_best=True,
            score_params_fn=jax.jit(score_params),
            consts=consts,
        )
