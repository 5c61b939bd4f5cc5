"""Deep CF family end-to-end on planted block data."""

import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.metrics import parse_measure


def _write_block_dataset(tmp_path):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            lines.append(f"u{u} i{i} 1\n")
    p = tmp_path / "ratings.txt"
    p.write_text("".join(lines))
    return str(p)


def _conf(tmp_path, ratings, name, extra=None):
    base = {
        "ratings": ratings,
        "ratings.setup": "-columns 0 1 2",
        "model.name": name,
        "evaluation.setup": "-ap 0.2",
        "item.ranking": "on -topN 10",
        "num.factors": "8",
        "num.max.epoch": "30",
        "batch_size": "64",
        "learnRate": "-init 0.01 -max 1",
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
        ("NeuMF", {"num.max.epoch": "20"}, 0.45),
        ("DMF", {"num.max.epoch": "15", "learnRate": "-init 0.001 -max 1"}, 0.45),
        (
            "CDAE",
            {"CDAE": "-co 0.8 -nh 32", "num.max.epoch": "150", "batch_size": "32"},
            0.45,
        ),
        ("APR", {"APR": "-eps 0.5 -regA 1 -advEpoch 10"}, 0.5),
        (
            "IRGAN",
            {"num.max.epoch": "30", "learnRate": "-init 0.02 -max 1"},
            0.4,
        ),
    ],
)
def test_deep_model_learns_blocks(tmp_path, name, extra, floor):
    ratings = _write_block_dataset(tmp_path)
    conf = _conf(tmp_path, ratings, name, extra)
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > floor, (name, parsed)


# ---------------------------------------------------------------------------
# Golden-value loss tests: hand-NumPy ports of the reference TF formulas,
# asserted against the jnp implementations on tiny random fixtures.
# ---------------------------------------------------------------------------


def _neumf_instance(reg_u=0.01):
    from qrec_tpu.models.deep import NeuMF

    m = object.__new__(NeuMF)  # _losses() reads only self.reg_u + _mlp_tower
    m.reg_u = reg_u
    return m


def _neumf_params(rng, n_u=5, n_i=7, d=4):
    r = np.random.RandomState(rng)
    f = lambda *s: r.randn(*s).astype(np.float32) * 0.3
    return {
        "PG": f(n_u, d), "QG": f(n_i, d), "PM": f(n_u, d), "QM": f(n_i, d),
        "h_mf": f(d), "h_mlp": f(d),
        "W1": f(2 * d, 5 * d), "b1": f(5 * d),
        "W2": f(5 * d, 2 * d), "b2": f(2 * d),
        "W3": f(2 * d, d), "b3": f(d),
    }


def _np_sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _np_mlp(p, um, im):
    h = np.maximum(np.concatenate([um, im], axis=-1) @ p["W1"] + p["b1"], 0)
    h = np.maximum(h @ p["W2"] + p["b2"], 0)
    return np.maximum(h @ p["W3"] + p["b3"], 0)


def test_neumf_forward_golden():
    """y_mf / y_neu vs a NumPy port of NeuMF.py:55-74 (GMF elementwise
    product through h_mf; fused head = 0.5·h_mf ⊕ 0.5·h_mlp)."""
    m = _neumf_instance()
    p = _neumf_params(0)
    y_neu, loss_mf, _, _ = m._losses()
    u = np.array([0, 1, 2, 4]); i = np.array([1, 0, 6, 3])
    got = np.asarray(y_neu(p, u, i))
    gmf = p["PG"][u] * p["QG"][i]
    mlp = _np_mlp(p, p["PM"][u], p["QM"][i])
    want = _np_sigmoid(0.5 * gmf @ p["h_mf"] + 0.5 * mlp @ p["h_mlp"])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_neumf_gmf_loss_golden():
    """GMF pretrain loss vs NeuMF.py:56-59: −Σ[r·log y + (1−r)·log(1−y)]
    + regU·(‖PG_u‖²/2 + ‖QG_i‖²/2 + ‖h_mf‖²/2)."""
    reg_u = 0.02
    m = _neumf_instance(reg_u)
    p = _neumf_params(1)
    _, loss_mf, _, _ = m._losses()
    u = np.array([0, 1, 2]); i = np.array([1, 0, 6])
    r = np.array([1.0, 0.0, 1.0], np.float32)
    w = np.ones(3, np.float32)
    got = float(loss_mf(p, (u, i, r, w), None))
    y = _np_sigmoid(np.sum(p["PG"][u] * p["QG"][i] * p["h_mf"], 1))
    eps = 10e-10
    ce = -np.sum(r * np.log(y + eps) + (1 - r) * np.log(1 - y + eps))
    reg = reg_u * 0.5 * (
        np.sum(p["PG"][u] ** 2) + np.sum(p["QG"][i] ** 2) + np.sum(p["h_mf"] ** 2)
    )
    np.testing.assert_allclose(got, ce + reg, rtol=1e-5)


def test_neumf_fused_loss_golden():
    """Fused loss vs NeuMF.py:70-76: CE + mf_reg + regU·‖0.5h_mf ⊕ 0.5h_mlp‖²/2."""
    reg_u = 0.03
    m = _neumf_instance(reg_u)
    p = _neumf_params(2)
    _, _, _, loss_neu = m._losses()
    u = np.array([3, 1]); i = np.array([5, 2])
    r = np.array([1.0, 0.0], np.float32)
    w = np.ones(2, np.float32)
    got = float(loss_neu(p, (u, i, r, w), None))
    gmf = p["PG"][u] * p["QG"][i]
    mlp = _np_mlp(p, p["PM"][u], p["QM"][i])
    y = _np_sigmoid(0.5 * gmf @ p["h_mf"] + 0.5 * mlp @ p["h_mlp"])
    eps = 10e-10
    ce = -np.sum(r * np.log(y + eps) + (1 - r) * np.log(1 - y + eps))
    h_neu = np.concatenate([0.5 * p["h_mf"], 0.5 * p["h_mlp"]])
    reg = reg_u * 0.5 * (
        np.sum(p["PG"][u] ** 2) + np.sum(p["QG"][i] ** 2) + np.sum(p["h_mf"] ** 2)
    ) + reg_u * 0.5 * np.sum(h_neu ** 2)
    np.testing.assert_allclose(got, ce + reg, rtol=1e-5)


def _cfgan_fixture(rng, bs=3, n_i=6):
    r = np.random.RandomState(rng)
    g = {"W1": r.randn(n_i, n_i).astype(np.float32) * 0.2,
         "b1": r.randn(n_i).astype(np.float32) * 0.1}
    d = {"W1": r.randn(2 * n_i, 1).astype(np.float32) * 0.2,
         "b1": r.randn(1).astype(np.float32) * 0.1}
    c = (r.rand(bs, n_i) > 0.5).astype(np.float32)
    mask = np.clip(c + (r.rand(bs, n_i) > 0.7), 0, 1).astype(np.float32)
    n_zr = ((1 - c) * (r.rand(bs, n_i) > 0.6)).astype(np.float32)
    return g, d, c, mask, n_zr


def test_cfgan_d_loss_golden():
    """D loss vs CFGAN.py:108: −mean[log D(c,c) + log(1 − D(G(c)·mask, c))]."""
    from qrec_tpu.models.deep import cfgan_fns

    g, d, c, mask, n_zr = _cfgan_fixture(3)
    _, _, d_loss_fn, _ = cfgan_fns(alpha=0.04)
    got = float(d_loss_fn(d, g, c, mask, n_zr))
    fake = _np_sigmoid(c @ g["W1"] + g["b1"]) * mask
    d_real = _np_sigmoid(np.concatenate([c, c], 1) @ d["W1"] + d["b1"])
    d_fake = _np_sigmoid(np.concatenate([fake, c], 1) @ d["W1"] + d["b1"])
    want = -np.mean(np.log(d_real + 10e-5) + np.log(1 - d_fake + 10e-5))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cfgan_g_loss_golden():
    """G loss vs CFGAN.py:109: mean log(1−D(fake,c)) + α·‖N_zr·fake‖²/2
    (zero-reconstruction over the sampled unrated columns)."""
    from qrec_tpu.models.deep import cfgan_fns

    alpha = 0.07
    g, d, c, mask, n_zr = _cfgan_fixture(4)
    _, _, _, g_loss_fn = cfgan_fns(alpha=alpha)
    got = float(g_loss_fn(g, d, c, mask, n_zr))
    fake = _np_sigmoid(c @ g["W1"] + g["b1"]) * mask
    d_fake = _np_sigmoid(np.concatenate([fake, c], 1) @ d["W1"] + d["b1"])
    want = np.mean(np.log(1 - d_fake + 10e-5)) + alpha * 0.5 * np.sum((n_zr * fake) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cfgan_runs(tmp_path):
    # CFGAN's adversarial dynamics are too noisy for a quality floor on a
    # toy dataset; assert it runs end-to-end and produces sane output
    ratings = _write_block_dataset(tmp_path)
    conf = _conf(
        tmp_path, ratings, "CFGAN",
        {"num.max.epoch": "50", "batch_size": "32"},
    )
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert 0 <= parsed["Top 10"]["Recall"] <= 1
