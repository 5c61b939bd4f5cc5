"""Social/hypergraph SSL family: MHCN, SEPT, BUIR, DiffNet, DHCF.

Reference: model/ranking/{MHCN,SEPT,BUIR,DiffNet,DHCF}.py. Motif/view
adjacency *construction* stays host-side scipy (one-time sparse algebra,
exactly the reference's formulas); everything per-step — propagation,
gating/attention, MIM and neighbor-discrimination SSL losses, momentum
targets, subgraph views — runs on device. Subgraph views are expressed as
masked+renormalized edge values from the step PRNG (ops/spmm), replacing the
reference's per-epoch host rebuilds.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..data.graph import COO, joint_bipartite_coo
from ..ops import losses as L
from ..ops.spmm import (
    DenseMat,
    DeviceCOO,
    join_consts,
    lightgcn_propagate,
    renormalize_vals,
    split_consts,
    spmm,
    view_adjacency,
)


def _split_mats(mats: dict):
    """Split a dict of adjacency backends into (templates, consts) for
    jit-argument threading (TrainSpec.consts — ops/spmm.split_consts):
    dense/COO arrays become runner arguments instead of HLO constants, so
    north-star-scale aux matrices survive the axon tunnel's embedded-
    constant cap. Rejoin inside traced code with ``_join(templates,
    consts, key)``."""
    templates, consts = {}, {}
    for k, v in mats.items():
        templates[k], consts[k] = split_consts(v)
    return templates, consts


def _join(templates: dict, consts: dict, k: str):
    return join_consts(templates[k], consts[k])
from .base import GraphRecommender, SocialRecommender, TrainSpec


def _sym_norm(m: sp.spmatrix) -> sp.csr_matrix:
    rowsum = np.asarray(m.sum(axis=1)).ravel()
    d_inv = np.power(rowsum, -0.5, where=rowsum > 0, out=np.zeros_like(rowsum))
    d = sp.diags(d_inv)
    return (d @ m @ d).tocsr()


def _row_norm(m: sp.spmatrix) -> sp.csr_matrix:
    rowsum = np.asarray(m.sum(axis=1)).ravel()
    d_inv = np.power(rowsum, -1.0, where=rowsum > 0, out=np.zeros_like(rowsum))
    return (sp.diags(d_inv) @ m).tocsr()


# Aggregate dense-entry pool for ONE model's aux matrices. Much tighter
# than DENSE_JOINT_LIMIT: (a) aux matrices stream from HBM per step — a
# near-budget one (e.g. DHCF's 235M-entry I×I hypergraph) costs more HBM
# traffic per application than its COO form; (b) DenseMat constants embed in
# the serialized computation, and the axon remote-compile tunnel rejects
# bodies past ~a few hundred MB (HTTP 413 — observed with DHCF at lastfm
# scale). 64M entries = 128 MB bf16.
AUX_DENSE_LIMIT = 64_000_000


class DenseBudget:
    """Cumulative dense-entry budget across ONE model's auxiliary matrices.

    The dense budget is an HBM/compile-size ceiling; applying it per matrix
    lets a model that materializes several aux adjacencies (MHCN:
    h_s/h_j/h_p/R/Rᵀ plus the joint adjacency) use a multiple of it in
    aggregate. Each model's ``build()`` creates one tracker and passes it to
    every ``_dev`` call; once the shared pool is spent, later matrices fall
    back to DeviceCOO.
    """

    def __init__(self, total: int = AUX_DENSE_LIMIT):
        self.remaining = total

    def take(self, entries: int) -> bool:
        if entries <= self.remaining:
            self.remaining -= entries
            return True
        return False


def _dev(m: sp.spmatrix, budget: "DenseBudget" = None, mode: str = "auto"):
    """Device operator for an auxiliary adjacency (motif/social/incidence).

    On TPU, matrices under the dense budget become one bf16 MXU matmul
    (ops/spmm.DenseMat) — random gather runs at ~2% of HBM bandwidth there,
    and these fixed per-step propagations dominate the MHCN/SEPT/DiffNet
    epoch. Elsewhere (and past the budget) the sorted-COO path is used.
    bf16 storage is the same precision class as the DenseJoint backend
    (~0.4% relative error on edge weights).

    ``mode`` comes from the ``graph.aux.dense`` config key: ``auto`` (TPU
    only, the default), ``on`` (force DenseMat on any backend — used to
    exercise the dense path under the virtual CPU mesh), ``off`` (pin COO).
    """
    import jax

    if mode not in ("auto", "on", "off"):
        from ..errors import ConfigError

        raise ConfigError(f"graph.aux.dense must be auto|on|off, got {mode!r}")
    entries = m.shape[0] * m.shape[1]
    want_dense = mode == "on" or (
        mode == "auto" and jax.default_backend() == "tpu"
    )
    if (
        want_dense
        and entries <= AUX_DENSE_LIMIT
        and (budget is None or budget.take(entries))
    ):
        return DenseMat.from_scipy(m)
    return DeviceCOO.from_host(COO.from_scipy(m))


def _xavier(rng, shape):
    return jax.nn.initializers.glorot_uniform()(rng, shape, jnp.float32)


def _l2(*xs):
    return sum(0.5 * jnp.sum(x**2) for x in xs)


def _l2n(x):
    """Row L2-normalize with TF semantics (tf.nn.l2_normalize): the epsilon
    lives INSIDE the rsqrt, so an exactly-zero row (e.g. a node isolated by
    edge/group dropout in SEPT's augmented view) has zero output AND zero
    gradient. ``x / (linalg.norm(x) + eps)`` instead produces NaN gradients
    at zero rows (d||x||/dx = x/||x||), which NaN'd SEPT's joint phase."""
    sq = jnp.sum(x * x, axis=1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))


def mhcn_channel_mim(rng, em, edge):
    """Hierarchical mutual-information maximization for one MHCN channel
    (MHCN.py hierarchical_self_supervision): pairwise-ranking MIM between
    the gated user embeddings ``em`` and their hypergraph-propagated
    counterpart ``edge = H_c @ em``, locally (row vs shuffled rows) and
    globally (vs the channel's mean readout). Module-level pure function of
    the two embedding matrices so the formula is golden-value testable
    (tests/test_social_graph_models.py)."""
    r1, r2, r3, r4 = jax.random.split(rng, 4)

    def row_shuffle(key, x):
        return x[jax.random.permutation(key, x.shape[0])]

    def row_col_shuffle(key, x):
        ka, kb = jax.random.split(key)
        x = x[:, jax.random.permutation(ka, x.shape[1])]
        return x[jax.random.permutation(kb, x.shape[0])]

    def score(a, b):
        return jnp.sum(a * b, axis=1)

    pos = score(em, edge)
    neg1 = score(row_shuffle(r1, em), edge)
    neg2 = score(row_col_shuffle(r2, edge), em)
    local = jnp.sum(
        -jnp.log(jax.nn.sigmoid(pos - neg1) + 1e-12)
        - jnp.log(jax.nn.sigmoid(neg1 - neg2) + 1e-12)
    )
    graph = jnp.mean(edge, axis=0)
    pos_g = edge @ graph
    neg_g = row_col_shuffle(r3, edge) @ graph
    global_ = jnp.sum(-jnp.log(jax.nn.sigmoid(pos_g - neg_g) + 1e-12))
    return local + global_


def sept_neighbor_ssl(aug_n, friend_n, share_n, rec_n, um, ins_cnt):
    """SEPT's pseudo-label neighbor discrimination (SEPT.py:220-268):
    each view's softmax over similarities to the augmented encoding yields
    label probabilities; the other two views vote a top-``ins_cnt``
    positive set; an InfoNCE at temperature 0.1 pulls each view's users
    toward their voted neighbors. All inputs are row-L2-normalized
    embeddings restricted to the batch's unique users; ``um`` masks the
    static-shape pad slots out of softmax, top-k, and the InfoNCE
    denominator (pads are copies of user 0 and would hijack the positives).
    Module-level for golden-value testing."""
    col_bias = jnp.where(um > 0, 0.0, -1e30)[None, :]

    def label_prob(emb):
        return jax.nn.softmax(emb @ aug_n.T + col_bias, axis=1)

    p_social = label_prob(friend_n)
    p_share = label_prob(share_n)
    p_rec = label_prob(rec_n)

    def neighbor_dis(positive, emb):
        pos_emb = aug_n[positive]  # (B, k, d)
        pos_scores = jnp.sum(emb[:, None, :] * pos_emb, axis=2)
        ttl = emb @ aug_n.T + col_bias
        pos_sum = jnp.sum(jnp.exp(pos_scores / 0.1), axis=1)
        ttl_sum = jnp.sum(jnp.exp(ttl / 0.1), axis=1)
        return -jnp.sum(um * jnp.log(pos_sum / ttl_sum + 1e-12))

    top = lambda p1, p2: jax.lax.top_k((p1 + p2) / 2, ins_cnt)[1]
    return (
        neighbor_dis(top(p_share, p_rec), friend_n)
        + neighbor_dis(top(p_social, p_rec), share_n)
        + neighbor_dis(top(p_social, p_share), rec_n)
    )


def buir_pair_loss(q_u, q_i, t_u, t_i, w):
    """BUIR's symmetric cross-prediction loss (BUIR.py:128-143): the online
    predictor of each side regresses onto the momentum target of the other,
    as cosine distance on L2-normalized rows, halved and weighted by the
    duplicate-pair weights ``w``. Module-level for golden-value testing."""
    loss = 1 - jnp.sum(_l2n(q_u) * _l2n(t_i), axis=1)
    loss = loss + 1 - jnp.sum(_l2n(q_i) * _l2n(t_u), axis=1)
    return jnp.sum(w * loss / 2)


class MHCN(SocialRecommender, GraphRecommender):
    """Multi-channel hypergraph convolution with self-gating, channel
    attention, and hierarchical mutual-information SSL (MHCN.py)."""

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.n_layers = args.get_int("-n_layer")
        self.ss_rate = args.get_float("-ss_rate")

    def _motif_matrices(self):
        """Triangle-motif adjacency algebra (MHCN.py:54-85), verbatim.

        Cached on disk keyed by the interaction/relation content hash (the
        algebra is a one-time O(nnz·deg) host cost — SURVEY hard part 4)."""
        import hashlib
        import pickle

        key_src = np.concatenate(
            [
                self.data.train_u, self.data.train_i,
                self.social.src, self.social.dst,
            ]
        ).tobytes()
        digest = hashlib.sha1(key_src).hexdigest()[:16]
        cache = f"/tmp/qrec_motifs_{digest}.pkl"
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                return pickle.load(f)
        result = self._compute_motif_matrices()
        with open(cache, "wb") as f:
            pickle.dump(result, f)
        return result

    def _compute_motif_matrices(self):
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
        a9 = a9 + a9.T
        a10 = y @ y.T - a8 - a9
        h_s = _row_norm(a1 + a2 + a3 + a4 + a5 + a6 + a7)
        h_j = _row_norm(a8 + a9)
        h_p = a10.multiply(a10 > 1)
        h_p = _row_norm(h_p)
        return h_s, h_j, h_p

    def _joint_r(self):
        """|U|×|I| adjacency with r/sqrt(|I_u|)/sqrt(|U_i|) values
        (MHCN.py:46-52)."""
        du = np.maximum(np.diff(self.data.u_indptr), 1).astype(np.float32)
        di = np.maximum(np.diff(self.data.i_indptr), 1).astype(np.float32)
        vals = self.data.train_r / np.sqrt(du[self.data.train_u]) / np.sqrt(
            di[self.data.train_i]
        )
        return sp.csr_matrix(
            (vals, (self.data.train_u, self.data.train_i)),
            shape=(self.num_users, self.num_items),
        )

    def build(self):
        budget = DenseBudget()
        aux_mode = self.config.get("graph.aux.dense", "auto")
        h_s, h_j, h_p = (
            _dev(m, budget, aux_mode) for m in self._motif_matrices()
        )
        r_mat = self._joint_r()
        r_dev = _dev(r_mat, budget, aux_mode)
        rt_dev = _dev(r_mat.T, budget, aux_mode)
        d = self.emb_size
        rng = jax.random.PRNGKey(self.seed)
        ks = jax.random.split(rng, 20)
        params = self.init_embeddings("normal")
        for c in range(4):
            params[f"gating{c}"] = _xavier(ks[2 * c], (d, d))
            params[f"gating_bias{c}"] = _xavier(ks[2 * c + 1], (1, d))
            params[f"sgating{c}"] = _xavier(ks[8 + c], (d, d))
            params[f"sgating_bias{c}"] = _xavier(ks[12 + c], (1, d))
        params["attention"] = _xavier(ks[16], (1, d))
        params["attention_mat"] = _xavier(ks[17], (d, d))
        n_layers = self.n_layers
        reg_u, ss_rate = self.reg_u, self.ss_rate
        nu = self.num_users

        def gate(params, em, c, s=""):
            return em * jax.nn.sigmoid(
                em @ params[f"{s}gating{c}"] + params[f"{s}gating_bias{c}"]
            )

        def attention(params, *chans):
            scores = jnp.stack(
                [
                    jnp.sum(params["attention"] * (c @ params["attention_mat"]), axis=1)
                    for c in chans
                ],
                axis=1,
            )  # (U, C)
            score = jax.nn.softmax(scores, axis=1)
            mixed = sum(score[:, i : i + 1] * chans[i] for i in range(len(chans)))
            return mixed, score

        templates, consts = _split_mats(
            {"h_s": h_s, "h_j": h_j, "h_p": h_p, "r": r_dev, "rt": rt_dev}
        )

        def encode(params, consts):
            u1 = gate(params, params["user_emb"], 0)
            u2 = gate(params, params["user_emb"], 1)
            u3 = gate(params, params["user_emb"], 2)
            simple = gate(params, params["user_emb"], 3)
            items = params["item_emb"]
            acc1, acc2, acc3, acc_s, acc_i = u1, u2, u3, simple, items
            for _ in range(n_layers):
                mixed = attention(params, u1, u2, u3)[0] + simple / 2
                u1 = spmm(_join(templates, consts, "h_s"), u1)
                acc1 = acc1 + _l2n(u1)
                u2 = spmm(_join(templates, consts, "h_j"), u2)
                acc2 = acc2 + _l2n(u2)
                u3 = spmm(_join(templates, consts, "h_p"), u3)
                acc3 = acc3 + _l2n(u3)
                new_items = spmm(_join(templates, consts, "rt"), mixed)
                acc_i = acc_i + _l2n(new_items)
                simple = spmm(_join(templates, consts, "r"), items)
                acc_s = acc_s + _l2n(simple)
                items = new_items
            final_u, _ = attention(params, acc1, acc2, acc3)
            final_u = final_u + acc_s / 2
            return final_u, acc_i

        def ss_loss_channel(rng, em, adj):
            return mhcn_channel_mim(rng, em, spmm(adj, em))

        weight_keys = (
            [f"gating{c}" for c in range(4)]
            + [f"gating_bias{c}" for c in range(4)]
            + [f"sgating{c}" for c in range(4)]
            + [f"sgating_bias{c}" for c in range(4)]
            + ["attention", "attention_mat"]
        )

        def loss_fn(params, batch, rng, consts):
            u, i, j, w = batch
            users, items = encode(params, consts)
            pu, qi, qj = users[u], items[i], items[j]
            pos = jnp.sum(pu * qi, axis=1)
            neg = jnp.sum(pu * qj, axis=1)
            rec = L.bpr_loss(pos, neg, w)
            reg = 0.001 * sum(_l2(params[k]) for k in weight_keys)
            reg = reg + reg_u * (_l2(params["user_emb"]) + _l2(params["item_emb"]))
            rs = jax.random.split(rng, 3)
            ss = (
                ss_loss_channel(
                    rs[0], gate(params, users, 0, "s"),
                    _join(templates, consts, "h_s"),
                )
                + ss_loss_channel(
                    rs[1], gate(params, users, 1, "s"),
                    _join(templates, consts, "h_j"),
                )
                + ss_loss_channel(
                    rs[2], gate(params, users, 2, "s"),
                    _join(templates, consts, "h_p"),
                )
            )
            return rec + reg + ss_rate * ss

        def score_params(params, consts):
            users, items = encode(params, consts)
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


class SEPT(SocialRecommender, GraphRecommender):
    """Tri-view social SSL with pseudo-label neighbor discrimination
    (SEPT.py). Warm-up on the rec task for maxEpoch/3, then joint training."""

    threads_adj_consts = True

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.n_layers = args.get_int("-n_layer")
        self.ss_rate = args.get_float("-ss_rate")
        self.drop_rate = args.get_float("-drop_rate")
        self.instance_cnt = args.get_int("-ins_cnt")

    def _views(self):
        src, dst, _ = self.social.coo()
        s = sp.csr_matrix(
            (np.ones(len(src), dtype=np.float32), (src, dst)),
            shape=(self.num_users, self.num_users),
        )
        bs = s.multiply(s)  # reference's literal bidirectional matrix
        y = sp.csr_matrix(
            (
                np.ones_like(self.data.train_u, dtype=np.float32),
                (self.data.train_u, self.data.train_i),
            ),
            shape=(self.num_users, self.num_items),
        )
        y.data[:] = 1.0
        social = (bs @ bs).multiply(bs) + sp.eye(self.num_users, dtype=np.float32)
        sharing = (y @ y.T).multiply(bs) + sp.eye(self.num_users, dtype=np.float32)
        return _sym_norm(social), _sym_norm(sharing)

    def _combined_graph(self):
        """Joint UI graph + directed social edges with drop-group ids for the
        on-device renormalized subgraph view (SEPT.py:80-113)."""
        rows, cols, edge_ids, n = joint_bipartite_coo(self.data)
        src, dst, _ = self.social.coo()
        n_int = int(edge_ids.max()) + 1 if len(edge_ids) else 0
        rows_c = np.concatenate([rows, src])
        cols_c = np.concatenate([cols, dst])
        ids_c = np.concatenate(
            [edge_ids, n_int + np.arange(len(src), dtype=np.int32)]
        )
        order = np.lexsort((cols_c, rows_c))
        return (
            jnp.asarray(rows_c[order].astype(np.int32)),
            jnp.asarray(cols_c[order].astype(np.int32)),
            jnp.asarray(ids_c[order].astype(np.int32)),
            n_int + len(src),
            n,
        )

    def fit(self):
        budget = DenseBudget()
        aux_mode = self.config.get("graph.aux.dense", "auto")
        social_dev, sharing_dev = (
            _dev(m, budget, aux_mode) for m in self._views()
        )
        templates, consts = _split_mats({
            "social": social_dev, "sharing": sharing_dev,
            "adj": self.joint_adj,
        })
        c_rows, c_cols, c_ids, n_groups, n_nodes = self._combined_graph()
        rng0 = jax.random.PRNGKey(self.seed)
        r1, r2 = jax.random.split(rng0)
        d = self.emb_size
        params = {
            "user_emb": (
                jax.random.truncated_normal(r1, -2, 2, (self.num_users, d)) * 0.005 / 2
            ).astype(jnp.float32),
            "item_emb": (
                jax.random.truncated_normal(r2, -2, 2, (self.num_items, d)) * 0.005 / 2
            ).astype(jnp.float32),
        }
        nu = self.num_users
        n_layers = self.n_layers
        reg_u, ss_rate = self.reg_u, self.ss_rate
        drop_rate, ins_cnt = self.drop_rate, self.instance_cnt

        def encode_views(params, consts):
            friend = params["user_emb"]
            share = params["user_emb"]
            acc_f, acc_s = friend, share
            ego = jnp.concatenate([params["user_emb"], params["item_emb"]])
            acc_e = ego
            for _ in range(n_layers):
                friend = spmm(_join(templates, consts, "social"), friend)
                acc_f = acc_f + _l2n(friend)
                share = spmm(_join(templates, consts, "sharing"), share)
                acc_s = acc_s + _l2n(share)
                ego = spmm(_join(templates, consts, "adj"), ego)
                acc_e = acc_e + _l2n(ego)
            return acc_f, acc_s, acc_e[:nu], acc_e[nu:]

        def encode_aug(params, rng):
            keep = jax.random.bernoulli(rng, 1.0 - drop_rate, (n_groups,))
            vals = renormalize_vals(
                c_rows, c_cols, keep[c_ids].astype(jnp.float32), n_nodes
            )
            # stays DeviceCOO: the combined UI+directed-social structure is
            # asymmetric, which the PaddedCOO kernel's shared-VJP cannot do
            aug_adj = DeviceCOO(c_rows, c_cols, vals, n_nodes, n_nodes)
            e = jnp.concatenate([params["user_emb"], params["item_emb"]])
            acc = e
            for _ in range(n_layers):
                e = spmm(aug_adj, e)
                acc = acc + _l2n(e)
            return acc[:nu]

        def rec_loss_fn(params, batch, rng, consts):
            u, i, j, w = batch
            _, _, users, items = encode_views(params, consts)
            pu, qi, qj = users[u], items[i], items[j]
            rec = L.bpr_loss(
                jnp.sum(pu * qi, axis=1), jnp.sum(pu * qj, axis=1), w
            )
            return rec + reg_u * (
                _l2(params["user_emb"]) + _l2(params["item_emb"])
            )

        def joint_loss_fn(params, batch, rng, consts):
            u, i, j, w = batch
            friend, share, users, items = encode_views(params, consts)
            pu, qi, qj = users[u], items[i], items[j]
            rec = L.bpr_loss(
                jnp.sum(pu * qi, axis=1), jnp.sum(pu * qj, axis=1), w
            )
            rec = rec + reg_u * (
                _l2(params["user_emb"]) + _l2(params["item_emb"])
            )
            aug_u = encode_aug(params, jax.random.fold_in(rng, 7))
            uu, um = L.unique_padded(u)
            # the reference's batch-local matrices have exactly the unique
            # users (dynamic shape, SEPT.py:220-255); our static-shape pad
            # slots are copies of user 0, so pad COLUMNS must be excluded
            # from label softmax, pseudo-label top-k, and the InfoNCE
            # denominator or they hijack the positives (sept_neighbor_ssl)
            ssl = sept_neighbor_ssl(
                _l2n(aug_u[uu]),
                _l2n(friend[uu]),
                _l2n(share[uu]),
                _l2n(users[uu]),
                um,
                ins_cnt,
            )
            return rec + ss_rate * ssl

        def score_params(params, consts):
            _, _, users, items = encode_views(params, consts)
            return {"user_emb": users, "item_emb": items}

        warm = max(1, int(self.max_epoch / 3))
        sampler = self.pairwise_sampler()
        # one tracker across warm-up + joint phases: the reference keeps a
        # single bestU/bestV over ALL epochs and restores it at the end
        # (SEPT.py:282-310) — without this, a joint-phase collapse would
        # discard a good warm-up epoch
        from ..runtime import trainer as T

        tracker = T.BestTracker()
        params = self.run_training(
            params, rec_loss_fn, sampler, mode="adam", track_best=True,
            score_params_fn=jax.jit(score_params), max_epoch=warm,
            tracker=tracker, return_best=False, consts=consts,
        )
        params = self.run_training(
            params, joint_loss_fn, sampler, mode="adam", track_best=True,
            score_params_fn=jax.jit(score_params),
            max_epoch=max(1, self.max_epoch - warm),
            tracker=tracker, consts=consts,
        )
        final = jax.jit(score_params)(params, consts)
        self.U, self.V = final["user_emb"], final["item_emb"]


class BUIR(GraphRecommender):
    """BYOL-style online/target LightGCN encoders over dropout subgraphs with
    momentum target updates and symmetric cosine-stop-gradient loss
    (BUIR.py)."""

    threads_adj_consts = True

    def read_configuration(self):
        super().read_configuration()
        args = self.model_args()
        self.n_layers = args.get_int("-n_layer")
        self.tau = args.get_float("-tau")
        self.drop_rate = args.get_float("-drop_rate")

    def fit(self):
        rows, cols, edge_ids, n_nodes = joint_bipartite_coo(self.data)
        rows_d, cols_d = jnp.asarray(rows), jnp.asarray(cols)
        ids_d = jnp.asarray(edge_ids)
        n_edges = int(edge_ids.max()) + 1 if len(edge_ids) else 0
        adj_t, adj_c = split_consts(self.joint_adj)
        d = self.emb_size
        ks = jax.random.split(jax.random.PRNGKey(self.seed), 4)
        params = {
            "user_emb": _xavier(ks[0], (self.num_users, d)),
            "item_emb": _xavier(ks[1], (self.num_items, d)),
            "W": _xavier(ks[2], (d, d)),
            "b": _xavier(ks[3], (1, d)),
        }
        target = {
            "user_emb": params["user_emb"],
            "item_emb": params["item_emb"],
        }
        nu = self.num_users
        n_layers, tau, drop_rate = self.n_layers, self.tau, self.drop_rate

        # fixed symmetric structure, per-view values → pallas kernel on TPU
        view_adj = view_adjacency(rows, cols, n_nodes, self.config, self.mesh)

        def dropped_propagate(emb_u, emb_i, rng):
            keep = jax.random.bernoulli(rng, 1.0 - drop_rate, (n_edges,))
            vals = renormalize_vals(
                rows_d, cols_d, keep[ids_d].astype(jnp.float32), n_nodes
            )
            e = jnp.concatenate([emb_u, emb_i])
            return lightgcn_propagate(view_adj, e, n_layers, vals)

        def linear(params, e):
            return jnp.tanh(e @ params["W"] + params["b"])

        def loss_fn(params, target, batch, rng):
            u, i, _, w = batch
            ro, rt = jax.random.split(rng)
            online = dropped_propagate(
                params["user_emb"], params["item_emb"], ro
            )
            tgt = dropped_propagate(
                target["user_emb"], target["item_emb"], rt
            )
            tgt = jax.lax.stop_gradient(tgt)
            q = linear(params, online)
            return buir_pair_loss(
                q[:nu][u], q[nu:][i], tgt[:nu][u], tgt[nu:][i], w
            )

        optimizer = optax.adam(self.lrate)
        opt_state = optimizer.init(params)

        @jax.jit
        def run_epoch(params, target, opt_state, batches, rng):
            nb = jax.tree_util.tree_leaves(batches)[0].shape[0]
            rngs = jax.random.split(rng, nb)

            def step(carry, xs):
                params, target, opt_state = carry
                batch, r = xs
                loss, grads = jax.value_and_grad(loss_fn)(params, target, batch, r)
                upd, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, upd)
                # momentum target update per step (BUIR.py:120-126,164)
                target = {
                    k: target[k] * tau + params[k] * (1 - tau) for k in target
                }
                return (params, target, opt_state), loss

            (params, target, opt_state), losses = jax.lax.scan(
                step, (params, target, opt_state), (batches, rngs)
            )
            return params, target, opt_state, jnp.sum(losses)

        sampler = self.pairwise_sampler()
        rng = jax.random.PRNGKey(self.seed + 1)
        for epoch in range(self.max_epoch):
            rng, rs, re = jax.random.split(rng, 3)
            batches = sampler(rs)
            params, target, opt_state, loss = run_epoch(
                params, target, opt_state, batches, re
            )
            if (epoch + 1) % 5 == 0 or epoch == self.max_epoch - 1:
                print(
                    f"{self.model_name} {self.fold} epoch {epoch + 1}: "
                    f"loss = {float(loss):.4f}"
                )

        @jax.jit
        def final_embeddings(params, adj_c):
            e = jnp.concatenate([params["user_emb"], params["item_emb"]])
            online = lightgcn_propagate(join_consts(adj_t, adj_c), e, n_layers)
            q = linear(params, online)
            return online[:nu], online[nu:], q[:nu], q[nu:]

        o_u, o_i, q_u, q_i = final_embeddings(params, adj_c)
        # score = q_i·o_u + o_i·q_u (BUIR.py:175-179) — fold into a single
        # concatenated embedding pair so the standard ranker applies
        self.U = jnp.concatenate([o_u, q_u], axis=1)
        self.V = jnp.concatenate([q_i, o_i], axis=1)


class DiffNet(SocialRecommender, GraphRecommender):
    """Social influence diffusion (DiffNet.py): S-propagated user embeddings
    through concat+W+ReLU layers, final user = social + A·item."""

    def read_configuration(self):
        super().read_configuration()
        self.n_layers = self.model_args().get_int("-n_layer")

    def build(self):
        src, dst, _ = self.social.coo()
        out_deg = np.bincount(src, minlength=self.num_users).astype(np.float32)
        s_vals = 1.0 / np.maximum(out_deg[src], 1)
        s_mat = sp.csr_matrix(
            (s_vals, (src, dst)), shape=(self.num_users, self.num_users)
        )
        budget = DenseBudget()
        aux_mode = self.config.get("graph.aux.dense", "auto")
        s_dev = _dev(s_mat, budget, aux_mode)
        # row-normalized rating matrix 1/|I_u| (graphRecommender.py:41-51)
        du = np.maximum(np.diff(self.data.u_indptr), 1).astype(np.float32)
        a_mat = sp.csr_matrix(
            (
                1.0 / du[self.data.train_u],
                (self.data.train_u, self.data.train_i),
            ),
            shape=(self.num_users, self.num_items),
        )
        a_dev = _dev(a_mat, budget, aux_mode)
        d = self.emb_size
        params = self.init_embeddings("normal")
        ks = jax.random.split(jax.random.PRNGKey(self.seed + 3), self.n_layers)
        for k in range(self.n_layers):
            params[f"W{k}"] = _xavier(ks[k], (2 * d, d))
        n_layers = self.n_layers
        reg_u = self.reg_u
        templates, consts = _split_mats({"s": s_dev, "a": a_dev})

        def encode(params, consts):
            u = params["user_emb"]
            for k in range(n_layers):
                nu_emb = spmm(_join(templates, consts, "s"), u)
                u = jax.nn.relu(
                    jnp.concatenate([nu_emb, u], axis=1) @ params[f"W{k}"]
                )
            return u + spmm(
                _join(templates, consts, "a"), params["item_emb"]
            )

        def loss_fn(params, batch, rng, consts):
            u, i, j, w = batch
            users = encode(params, consts)
            pu = users[u]
            qi = params["item_emb"][i]
            qj = params["item_emb"][j]
            y = jnp.sum(pu * qi, axis=1) - jnp.sum(pu * qj, axis=1)
            loss = -jnp.sum(w * jnp.log(jax.nn.sigmoid(y) + 1e-12))
            reg = reg_u * (
                _l2(pu * w[:, None]) + _l2(qi * w[:, None]) + _l2(qj * w[:, None])
            )
            return loss + reg

        def score_params(params, consts):
            return {
                "user_emb": encode(params, consts),
                "item_emb": params["item_emb"],
            }

        return TrainSpec(
            params,
            loss_fn,
            self.pairwise_sampler(),
            mode="adam",
            track_best=False,
            score_params_fn=jax.jit(score_params),
            consts=consts,
        )


class DHCF(GraphRecommender):
    """Dual-channel hypergraph CF with 1-hop incidence normalization,
    residual transforms, message dropout, and layer concat (DHCF.py)."""

    n_layers = 2  # fixed in the reference (DHCF.py:58)

    def build(self):
        a = sp.csr_matrix(
            (
                np.ones_like(self.data.train_u, dtype=np.float32),
                (self.data.train_u, self.data.train_i),
            ),
            shape=(self.num_users, self.num_items),
        )
        a.data[:] = 1.0

        def hyper_norm(h):
            d_v = np.asarray(h.sum(axis=1)).ravel()  # node degree
            d_e = np.asarray(h.sum(axis=0)).ravel()  # hyperedge degree
            dv = sp.diags(
                np.power(d_v, -0.5, where=d_v > 0, out=np.zeros_like(d_v))
            )
            de = sp.diags(
                np.power(d_e, -1.0, where=d_e > 0, out=np.zeros_like(d_e))
            )
            # D_v^-1/2 H D_e^-1 H^T D_v^-1/2 (DHCF.py:33-50)
            return (dv @ h @ de @ h.T @ dv).tocsr()

        budget = DenseBudget()
        aux_mode = self.config.get("graph.aux.dense", "auto")
        a_u = _dev(hyper_norm(a), budget, aux_mode)
        a_i = _dev(hyper_norm(a.T.tocsr()), budget, aux_mode)
        d = self.emb_size
        params = self.init_embeddings("normal")
        ks = jax.random.split(jax.random.PRNGKey(self.seed + 5), self.n_layers)
        for k in range(self.n_layers):
            params[f"layer{k}"] = _xavier(ks[k], (d, d))
        n_layers = self.n_layers
        reg_u = self.reg_u
        templates, consts = _split_mats({"a_u": a_u, "a_i": a_i})

        def encode(params, consts, rng=None):
            u = params["user_emb"]
            v = params["item_emb"]
            all_u, all_v = [u], [v]
            for k in range(n_layers):
                # always base embeddings
                new_u = spmm(_join(templates, consts, "a_u"), params["user_emb"])
                new_v = spmm(_join(templates, consts, "a_i"), params["item_emb"])
                u = jax.nn.leaky_relu(new_u @ params[f"layer{k}"] + u)
                v = jax.nn.leaky_relu(new_v @ params[f"layer{k}"] + v)
                if rng is not None:
                    r1, r2, rng = jax.random.split(rng, 3)
                    mu = jax.random.bernoulli(r1, 0.9, u.shape)
                    mv = jax.random.bernoulli(r2, 0.9, v.shape)
                    u = jnp.where(mu, u / 0.9, 0.0)
                    v = jnp.where(mv, v / 0.9, 0.0)
                u = _l2n(u)
                v = _l2n(v)
                all_u.append(u)
                all_v.append(v)
            return jnp.concatenate(all_u, axis=1), jnp.concatenate(all_v, axis=1)

        def loss_fn(params, batch, rng, consts):
            u, i, j, w = batch
            users, items = encode(params, consts, rng)
            pu, qi, qj = users[u], items[i], items[j]
            y = jnp.sum(pu * qi, axis=1) - jnp.sum(pu * qj, axis=1)
            loss = -jnp.sum(w * jnp.log(jax.nn.sigmoid(y) + 1e-12))
            reg = reg_u * (
                _l2(pu * w[:, None]) + _l2(qi * w[:, None]) + _l2(qj * w[:, None])
            )
            reg = reg + reg_u * sum(
                _l2(params[f"layer{k}"]) for k in range(n_layers)
            )
            return loss + reg

        def score_params(params, consts):
            users, items = encode(params, consts, None)
            return {"user_emb": users, "item_emb": items}

        return TrainSpec(
            params,
            loss_fn,
            self.pairwise_sampler(),
            mode="adam",
            track_best=False,
            score_params_fn=jax.jit(score_params),
            consts=consts,
        )
