"""Classical family tests: KNN/SlopeOne vs hand-built reference loops,
SVD++/EE quality floors."""

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
            lines.append(f"u{u} i{i} {rng.randint(3, 6)}\n")
    p = tmp_path / "ratings.txt"
    p.write_text("".join(lines))
    return str(p)


def _conf(ratings, name, extra=None):
    base = {
        "ratings": ratings,
        "ratings.setup": "-columns 0 1 2",
        "model.name": name,
        "evaluation.setup": "-ap 0.2",
        "item.ranking": "off -topN 10",
        "num.factors": "8",
        "num.max.epoch": "25",
        "batch_size": "64",
        "learnRate": "-init 0.01 -max 1",
        "reg.lambda": "-u 0.01 -i 0.01 -b 0.1 -s 0.1",
        "similarity": "pcc",
        "num.neighbors": "10",
        "output.setup": "off -dir ./results/",
        "seed": "7",
    }
    if extra:
        base.update(extra)
    return ModelConf(base)


@pytest.mark.parametrize(
    "name,extra,ceil",
    [
        ("UserKNN", {}, 1.5),
        ("UserKNN", {"similarity": "cos"}, 1.5),
        ("ItemKNN", {}, 1.6),
        ("SlopeOne", {}, 1.6),
        ("EE", {}, 1.7),
        ("SVDPlusPlus", {"SVDPlusPlus": "-y 0.01"}, 1.7),
    ],
)
def test_classical_rating_models(tmp_path, name, extra, ceil):
    ratings = _write_block_dataset(tmp_path)
    conf = _conf(ratings, name, extra)
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)["global"]
    assert parsed["RMSE"] < ceil, (name, parsed)


def test_userknn_matches_reference_loop(tmp_path):
    """Cross-check a few predictions against a faithful dict-based
    reimplementation of the reference's UserKNN (UserKNN.py:28-66)."""
    import math

    ratings = _write_block_dataset(tmp_path)
    conf = _conf(ratings, "UserKNN", {"num.neighbors": "5"})
    rec = QRec(conf, seed=3)
    rec.execute()
    model = rec.model
    data = model.data

    def pearson_sp(x1, x2):
        try:
            mean1 = sum(x1.values()) / len(x1)
            mean2 = sum(x2.values()) / len(x2)
            total = d1 = d2 = 0.0
            overlapped = False
            for k in x1:
                if k in x2:
                    total += (x1[k] - mean1) * (x2[k] - mean2)
                    d1 += (x1[k] - mean1) ** 2
                    d2 += (x2[k] - mean2) ** 2
                    overlapped = True
            denom = math.sqrt(d1) * math.sqrt(d2)
            if denom == 0:
                raise ZeroDivisionError
            return total / denom
        except ZeroDivisionError:
            return 1 if overlapped else 0

    test_users = [e[0] for e in data.test_data[:10]]
    test_items = [e[1] for e in data.test_data[:10]]
    got = model.predict_ratings(test_users, test_items)
    for n, (u, i) in enumerate(zip(test_users, test_items)):
        sims = sorted(
            (
                (v, pearson_sp(data.train_set_u[u], data.train_set_u[v]))
                for v in data.user
                if v != u
            ),
            key=lambda d: d[1],
            reverse=True,
        )[:5]
        ssum = denom = 0.0
        for v, s in sims:
            r = data.rating(v, i)
            if r != -1:
                ssum += s * (r - float(data.user_means[data.user[v]]))
                denom += s
        if ssum == 0:
            expected = float(data.user_means[data.user[u]])
        else:
            expected = float(data.user_means[data.user[u]]) + ssum / denom
        assert got[n] == pytest.approx(expected, abs=2e-3), (u, i)


def test_knn_ranking_unsupported(tmp_path):
    from qrec_tpu.errors import EvaluationError

    ratings = _write_block_dataset(tmp_path)
    conf = _conf(ratings, "UserKNN", {"item.ranking": "on -topN 10"})
    with pytest.raises(EvaluationError):
        QRec(conf, seed=1).execute()
