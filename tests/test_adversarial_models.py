"""IF_BPR / ESRF / RSGAN end-to-end on planted block data with social
blocks and a synthetic negative-feedback file."""

import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.metrics import parse_measure


def _write_dataset(tmp_path, with_negative=False):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            lines.append(f"u{u} i{i} 1\n")
    rp = tmp_path / "ratings.txt"
    rp.write_text("".join(lines))
    if with_negative:
        neg = []
        for u in range(40):
            other = 15 if u < 20 else 0
            for i in rng.choice(15, size=3, replace=False) + other:
                neg.append(f"u{u} i{i} 1\n")
        (tmp_path / "ratings_n.txt").write_text("".join(neg))
    trust = []
    for u in range(40):
        lo = 0 if u < 20 else 20
        for f in rng.choice(20, size=4, replace=False) + lo:
            if f != u:
                trust.append(f"u{u} u{f} 1\n")
    for u in range(0, 40, 2):
        trust.append(f"u{u} u{u + 1} 1\n")
        trust.append(f"u{u + 1} u{u} 1\n")
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


# ---------------------------------------------------------------------------
# Golden-value tests: NumPy ports of the reference formulas vs the jnp code.
# ---------------------------------------------------------------------------


def test_irgan_sampling_dist_golden():
    """Importance-sampling proposal vs IRGAN.py:152-156:
    pn = (1−λ)·softmax(logits); pn[pos] += λ/|pos|."""
    import jax.numpy as jnp
    from qrec_tpu.models.gan import generator_sampling_dist

    r = np.random.RandomState(0)
    n_u, n_i, maxdeg = 4, 9, 3
    logits = r.randn(n_u, n_i).astype(np.float32)
    prob = np.exp(logits) / np.exp(logits).sum(1, keepdims=True)
    pos = np.array([[0, 1, 2], [3, 4, 0], [5, 0, 0], [6, 7, 8]], np.int32)
    pmask = np.array([[1, 1, 1], [1, 1, 0], [1, 0, 0], [1, 1, 1]], np.float32)
    deg = pmask.sum(1)
    got = np.asarray(
        generator_sampling_dist(jnp.asarray(prob), jnp.asarray(pos), jnp.asarray(pmask), jnp.asarray(deg), lam=0.2)
    )
    want = 0.8 * prob
    for u in range(n_u):
        for k in range(maxdeg):
            if pmask[u, k]:
                want[u, pos[u, k]] += 0.2 / deg[u]
    np.testing.assert_allclose(got, want, rtol=1e-5)
    np.testing.assert_allclose(got.sum(1), np.ones(n_u), rtol=1e-5)


def test_irgan_importance_reward_golden():
    """Reward vs IRGAN.py:159-162 (reward = 2(σ(D)−0.5), scaled by
    prob[sample]/pn[sample] importance correction)."""
    import jax.numpy as jnp
    from qrec_tpu.models.gan import importance_reward

    r = np.random.RandomState(1)
    n_u, n_i, k = 3, 8, 5
    prob = r.dirichlet(np.ones(n_i), n_u).astype(np.float32)
    pn = r.dirichlet(np.ones(n_i), n_u).astype(np.float32)
    sample = r.randint(0, n_i, (n_u, k)).astype(np.int32)
    d_logits = r.randn(n_u, k).astype(np.float32)
    got = np.asarray(
        importance_reward(jnp.asarray(d_logits), jnp.asarray(prob), jnp.asarray(pn), jnp.asarray(sample))
    )
    sig = 1 / (1 + np.exp(-d_logits))
    want = 2 * (sig - 0.5)
    for u in range(n_u):
        want[u] *= prob[u, sample[u]] / pn[u, sample[u]]
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_esrf_gumbel_softmax_golden():
    """gumbel_softmax vs ESRF.py:12-17: softmax → log(+eps) → +Gumbel noise
    → softmax/T, with the noise replayed from the same PRNG key."""
    import jax
    import jax.numpy as jnp
    from qrec_tpu.models.adversarial_social import gumbel_softmax

    r = np.random.RandomState(2)
    logits = r.randn(3, 7).astype(np.float32)
    key = jax.random.PRNGKey(5)
    got = np.asarray(gumbel_softmax(key, jnp.asarray(logits), 0.2))
    u = np.asarray(jax.random.uniform(key, logits.shape))
    eps = 1e-10
    noise = -np.log(-np.log(u + eps) + eps)
    sm = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    y = np.log(sm + eps) + noise
    # softmax(y/T), max-shifted for stability
    want = np.exp(y / 0.2 - (y / 0.2).max(-1, keepdims=True))
    want /= want.sum(-1, keepdims=True)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-6)


def test_esrf_concrete_selection_multi_hot():
    """K Gumbel-softmax draws summed → soft multi-hot rows totalling K
    (ESRF.py:106-113's getAlternativeNeighborhood)."""
    import jax
    import jax.numpy as jnp
    from qrec_tpu.models.adversarial_social import gumbel_softmax

    r = np.random.RandomState(3)
    seg, K, n_u = 4, 3, 11
    feats = r.randn(seg, n_u).astype(np.float32)
    selector = r.randn(K, n_u).astype(np.float32)
    alpha = feats[:, None, :] * selector[None, :, :]
    draws = gumbel_softmax(jax.random.PRNGKey(9), jnp.asarray(alpha), 0.2)
    multi_hot = np.asarray(jnp.sum(draws, axis=1))
    assert multi_hot.shape == (seg, n_u)
    np.testing.assert_allclose(multi_hot.sum(1), np.full(seg, float(K)), rtol=1e-4)
    assert (multi_hot >= 0).all()


def test_if_bpr_with_negative_feedback(tmp_path):
    ratings, trust = _write_dataset(tmp_path, with_negative=True)
    conf = _conf(
        tmp_path and ratings, trust, "IF_BPR",
        {"IF_BPR": "-L 20 -l 16 -w 5 -k 10 -a 0.1 -ep 10 -neg 3 -r 0.2",
         "learnRate": "-init 0.02 -max 1"},
    )
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > 0.45, parsed


def test_if_bpr_without_negative_file(tmp_path):
    ratings, trust = _write_dataset(tmp_path, with_negative=False)
    conf = _conf(
        ratings, trust, "IF_BPR",
        {"IF_BPR": "-L 20 -l 16 -w 5 -k 10 -a 0.1 -ep 10 -neg 3 -r 0.2",
         "learnRate": "-init 0.02 -max 1"},
    )
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > 0.45, parsed


def test_esrf_learns_blocks(tmp_path):
    ratings, trust = _write_dataset(tmp_path)
    conf = _conf(
        ratings, trust, "ESRF",
        {"ESRF": "-K 5 -beta 0.1 -n_layer 2", "num.max.epoch": "30"},
    )
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > 0.45, parsed


def test_rsgan_runs_and_learns(tmp_path):
    ratings, trust = _write_dataset(tmp_path, with_negative=True)
    conf = _conf(
        ratings, trust, "RSGAN",
        {"num.max.epoch": "30", "learnRate": "-init 0.02 -max 1"},
    )
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    # GAN training on tiny data is noisy; require clearly-above-random
    assert parsed["Top 10"]["Recall"] > 0.35, parsed
