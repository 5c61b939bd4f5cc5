"""Social/hypergraph SSL family end-to-end on planted block data + social
blocks."""

import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.metrics import parse_measure


def _write_dataset(tmp_path):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            lines.append(f"u{u} i{i} 1\n")
    rp = tmp_path / "ratings.txt"
    rp.write_text("".join(lines))
    trust = []
    for u in range(40):
        lo = 0 if u < 20 else 20
        for f in rng.choice(20, size=4, replace=False) + lo:
            if f != u:
                trust.append(f"u{u} u{f} 1\n")
    # add some reciprocated edges so motif algebra has bidirectional pairs
    for u in range(0, 40, 2):
        v = u + 1
        trust.append(f"u{u} u{v} 1\n")
        trust.append(f"u{v} u{u} 1\n")
    tp = tmp_path / "trust.txt"
    tp.write_text("".join(trust))
    return str(rp), str(tp)


def _conf(ratings, trust, name, extra=None):
    base = {
        "ratings": ratings,
        "ratings.setup": "-columns 0 1 2",
        "social": trust,
        "social.setup": "-columns 0 1 2",
        "model.name": name,
        "evaluation.setup": "-ap 0.2",
        "item.ranking": "on -topN 10",
        "num.factors": "16",
        "num.max.epoch": "30",
        "batch_size": "64",
        "learnRate": "-init 0.05 -max 1",
        "reg.lambda": "-u 0.001 -i 0.001 -b 0.1 -s 0.1",
        "output.setup": "off -dir ./results/",
        "seed": "7",
    }
    if extra:
        base.update(extra)
    return ModelConf(base)


@pytest.mark.parametrize(
    "name,extra,floor",
    [
        ("MHCN", {"MHCN": "-n_layer 2 -ss_rate 0.01"}, 0.5),
        (
            "SEPT",
            {"SEPT": "-n_layer 2 -ss_rate 0.005 -drop_rate 0.3 -ins_cnt 5"},
            0.5,
        ),
        (
            "BUIR",
            {
                "BUIR": "-n_layer 2 -tau 0.99 -drop_rate 0.2",
                "learnRate": "-init 0.01 -max 1",
                "num.max.epoch": "40",
            },
            0.35,  # negative-sample-free objective learns slower on tiny data
        ),
        ("DiffNet", {"DiffNet": "-n_layer 2"}, 0.5),
        ("DHCF", {}, 0.5),
    ],
)
def test_social_graph_models(tmp_path, name, extra, floor):
    ratings, trust = _write_dataset(tmp_path)
    conf = _conf(ratings, trust, name, extra)
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > floor, (name, parsed)


def test_l2n_zero_row_has_finite_gradient():
    """SEPT's augmented view isolates nodes (zero propagated rows); the
    TF-style l2_normalize must give finite (zero) gradients there — the
    norm+eps form NaN'd SEPT's whole joint phase (SEPT.py:282-310)."""
    import jax
    import jax.numpy as jnp

    from qrec_tpu.models.social_graph import _l2n

    x = jnp.array([[0.0, 0.0, 0.0], [1.0, 2.0, 2.0]])

    def f(x):
        return jnp.sum(_l2n(x) * jnp.ones_like(x))

    g = jax.grad(f)(x)
    # finite (TF gives rsqrt(eps)*cotangent at zero rows — large but finite;
    # the old norm+eps form gave NaN). Adam absorbs the magnitude.
    assert bool(jnp.all(jnp.isfinite(g)))
    # nonzero row normalizes to unit norm
    assert float(jnp.linalg.norm(_l2n(x)[1])) == pytest.approx(1.0, abs=1e-5)


def test_masked_infonce_zero_row_grad_finite():
    import jax
    import jax.numpy as jnp

    from qrec_tpu.ops import losses as L

    v1 = jnp.array([[0.0, 0.0], [1.0, 0.5], [0.3, -0.2]])
    v2 = jnp.array([[0.1, 0.2], [0.0, 0.0], [0.5, 0.5]])
    mask = jnp.array([1.0, 1.0, 1.0])
    g = jax.grad(lambda a: L.masked_infonce(a, v2, mask, 0.2))(v1)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_mhcn_channel_mim_golden():
    """MHCN's hierarchical MIM channel loss vs a hand-NumPy reference
    (MHCN.py hierarchical_self_supervision) — a sign slip on the
    pairwise-ranking terms or a wrong readout would shave quality silently."""
    import jax
    import jax.numpy as jnp

    from qrec_tpu.models.social_graph import mhcn_channel_mim

    rng = np.random.RandomState(11)
    em = rng.randn(7, 5).astype(np.float32)
    edge = rng.randn(7, 5).astype(np.float32)
    key = jax.random.PRNGKey(3)
    got = float(mhcn_channel_mim(key, jnp.asarray(em), jnp.asarray(edge)))

    # NumPy reference, using the same jax-derived permutations
    r1, r2, r3, r4 = jax.random.split(key, 4)

    def perm(k, n):
        return np.asarray(jax.random.permutation(k, n))

    def sigm(x):
        return 1.0 / (1.0 + np.exp(-x))

    pos = np.sum(em * edge, axis=1)
    neg1 = np.sum(em[perm(r1, 7)] * edge, axis=1)
    r2a, r2b = jax.random.split(r2)
    shuf = edge[:, perm(r2a, 5)][perm(r2b, 7)]
    neg2 = np.sum(shuf * em, axis=1)
    local = np.sum(
        -np.log(sigm(pos - neg1) + 1e-12) - np.log(sigm(neg1 - neg2) + 1e-12)
    )
    graph = edge.mean(axis=0)
    r3a, r3b = jax.random.split(r3)
    shuf_g = edge[:, perm(r3a, 5)][perm(r3b, 7)]
    global_ = np.sum(-np.log(sigm(edge @ graph - shuf_g @ graph) + 1e-12))
    assert got == pytest.approx(float(local + global_), rel=1e-5)


def test_sept_neighbor_ssl_golden():
    """SEPT's pseudo-label neighbor discrimination vs a hand-NumPy
    reference (SEPT.py:220-268), including the pad-column masking."""
    import jax.numpy as jnp

    from qrec_tpu.models.social_graph import sept_neighbor_ssl

    rng = np.random.RandomState(5)
    B, d, k = 6, 4, 2

    def l2n(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-6)

    aug = l2n(rng.randn(B, d)).astype(np.float32)
    fr = l2n(rng.randn(B, d)).astype(np.float32)
    sh = l2n(rng.randn(B, d)).astype(np.float32)
    rc = l2n(rng.randn(B, d)).astype(np.float32)
    um = np.array([1, 1, 1, 1, 0, 0], dtype=np.float32)  # 2 pad slots

    got = float(
        sept_neighbor_ssl(
            jnp.asarray(aug), jnp.asarray(fr), jnp.asarray(sh),
            jnp.asarray(rc), jnp.asarray(um), k,
        )
    )

    bias = np.where(um > 0, 0.0, -1e30)[None, :]

    def softmax(x):
        e = np.exp(x - x.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    p_soc = softmax(fr @ aug.T + bias)
    p_sha = softmax(sh @ aug.T + bias)
    p_rec = softmax(rc @ aug.T + bias)

    def topk(p, k):
        return np.argsort(-p, axis=1, kind="stable")[:, :k]

    def ndis(pos_idx, emb):
        pos_scores = np.stack(
            [np.sum(emb * aug[pos_idx[:, j]], axis=1) for j in range(k)], axis=1
        )
        ttl = emb @ aug.T + bias
        pos_sum = np.sum(np.exp(pos_scores / 0.1), axis=1)
        ttl_sum = np.sum(np.exp(ttl / 0.1), axis=1)
        return -np.sum(um * np.log(pos_sum / ttl_sum + 1e-12))

    want = (
        ndis(topk((p_sha + p_rec) / 2, k), fr)
        + ndis(topk((p_soc + p_rec) / 2, k), sh)
        + ndis(topk((p_soc + p_sha) / 2, k), rc)
    )
    assert got == pytest.approx(float(want), rel=1e-4)


def test_buir_pair_loss_golden():
    """BUIR's symmetric cross-prediction vs a hand-NumPy reference
    (BUIR.py:128-143)."""
    import jax.numpy as jnp

    from qrec_tpu.models.social_graph import buir_pair_loss

    rng = np.random.RandomState(9)
    B, d = 5, 3
    qu, qi, tu, ti = (rng.randn(B, d).astype(np.float32) for _ in range(4))
    w = rng.rand(B).astype(np.float32)
    got = float(
        buir_pair_loss(*(jnp.asarray(a) for a in (qu, qi, tu, ti, w)))
    )

    def l2n(x):
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    loss = 1 - np.sum(l2n(qu) * l2n(ti), axis=1)
    loss = loss + 1 - np.sum(l2n(qi) * l2n(tu), axis=1)
    assert got == pytest.approx(float(np.sum(w * loss / 2)), rel=1e-5)
