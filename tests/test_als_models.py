"""ALS family end-to-end + weighted-ridge unit checks."""

import jax.numpy as jnp
import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.als import solve_factors, weighted_ridge_batch
from qrec_tpu.ops.metrics import parse_measure


def test_weighted_ridge_matches_numpy():
    rng = np.random.RandomState(0)
    n, d, b = 20, 4, 3
    y = rng.randn(n, d).astype(np.float32)
    w = rng.rand(b, n).astype(np.float32) + 0.5
    t = (rng.rand(b, n) > 0.5).astype(np.float32)
    reg = 0.1
    got = np.asarray(weighted_ridge_batch(jnp.asarray(y), jnp.asarray(w), jnp.asarray(t), reg))
    for k in range(b):
        a = y.T @ np.diag(w[k]) @ y + reg * np.eye(d)
        rhs = y.T @ (w[k] * t[k])
        expected = np.linalg.solve(a, rhs)
        assert np.allclose(got[k], expected, atol=1e-4)


def test_solve_factors_chunking():
    rng = np.random.RandomState(1)
    n, d, m = 16, 3, 10
    y = jnp.asarray(rng.randn(n, d).astype(np.float32))
    w = jnp.asarray(rng.rand(m, n).astype(np.float32) + 0.5)
    t = jnp.asarray((rng.rand(m, n) > 0.5).astype(np.float32))
    full = np.asarray(weighted_ridge_batch(y, w, t, 0.05))
    chunked = np.asarray(solve_factors(y, w, t, 0.05, chunk=4))
    assert np.allclose(full, chunked, atol=1e-5)


def _write_block_dataset(tmp_path, with_trust=False):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            lines.append(f"u{u} i{i} 1\n")
    rp = tmp_path / "ratings.txt"
    rp.write_text("".join(lines))
    if not with_trust:
        return str(rp), None
    trust = []
    for u in range(40):
        lo = 0 if u < 20 else 20
        for f in rng.choice(20, size=3, replace=False) + lo:
            if f != u:
                trust.append(f"u{u} u{f} 1\n")
    tp = tmp_path / "trust.txt"
    tp.write_text("".join(trust))
    return str(rp), str(tp)


def _conf(ratings, trust, name, extra=None):
    base = {
        "ratings": ratings,
        "ratings.setup": "-columns 0 1 2",
        "model.name": name,
        "evaluation.setup": "-ap 0.2",
        "item.ranking": "on -topN 10",
        "num.factors": "8",
        "num.max.epoch": "10",
        "batch_size": "64",
        "learnRate": "-init 0.01 -max 1",
        "reg.lambda": "-u 0.1 -i 0.1 -b 0.1 -s 0.1",
        "output.setup": "off -dir ./results/",
        "seed": "7",
    }
    if trust:
        base["social"] = trust
        base["social.setup"] = "-columns 0 1 2"
    if extra:
        base.update(extra)
    return ModelConf(base)


@pytest.mark.parametrize(
    "name,extra,floor",
    [
        ("WRMF", {}, 0.6),
        ("ExpoMF", {}, 0.5),
        ("CoFactor", {"CoFactor": "-k 2 -gamma 0.1 -filter 1"}, 0.55),
    ],
)
def test_als_models_learn_blocks(tmp_path, name, extra, floor):
    ratings, _ = _write_block_dataset(tmp_path)
    conf = _conf(ratings, None, name, extra)
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > floor, (name, parsed)


def test_serec_learns_blocks(tmp_path):
    ratings, trust = _write_block_dataset(tmp_path, with_trust=True)
    conf = _conf(ratings, trust, "SERec")
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > 0.5, parsed
