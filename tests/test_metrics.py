"""Metric parity: host metrics vs hand-computed values and the reference
formulas; device metrics vs host metrics (util/measure.py)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from qrec_tpu.ops import metrics as M


def _origin_reclist():
    origin = {
        "u1": {"a": 1.0, "b": 1.0, "c": 1.0},
        "u2": {"d": 1.0},
    }
    rec_list = {
        # u1: hits at ranks 0 and 2
        "u1": [("a", 0.9), ("x", 0.8), ("b", 0.7), ("y", 0.6)],
        # u2: no hits
        "u2": [("x", 0.9), ("y", 0.8), ("z", 0.7), ("w", 0.6)],
    }
    return origin, rec_list


def test_hand_computed_ranking_measure():
    origin, rec_list = _origin_reclist()
    lines = M.ranking_measure(origin, rec_list, [4])
    parsed = M.parse_measure(lines)["Top 4"]
    # precision = (2 + 0) / (2 users * 4)
    assert parsed["Precision"] == pytest.approx(2 / 8)
    # recall = mean(2/3, 0/1)
    assert parsed["Recall"] == pytest.approx((2 / 3) / 2)
    # NDCG: u1 DCG = 1/ln2 + 1/ln4 ; IDCG = 1/ln2+1/ln3+1/ln4 ; u2 → 0
    dcg = 1 / math.log(2) + 1 / math.log(4)
    idcg = 1 / math.log(2) + 1 / math.log(3) + 1 / math.log(4)
    assert parsed["NDCG"] == pytest.approx((dcg / idcg) / 2)
    p, r = parsed["Precision"], parsed["Recall"]
    assert parsed["F1"] == pytest.approx(2 * p * r / (p + r))


def test_rating_measure():
    res = [["u", "i", 3.0, 2.5], ["u", "j", 4.0, 4.5]]
    lines = M.rating_measure(res)
    parsed = M.parse_measure(lines)["global"]
    assert parsed["MAE"] == pytest.approx(0.5)
    assert parsed["RMSE"] == pytest.approx(0.5)


def test_device_metrics_match_host():
    rng = np.random.RandomState(0)
    num_items, n_users, top_n = 50, 30, 10
    origin, rec_list = {}, {}
    pred_ids = np.zeros((n_users, top_n), dtype=np.int32)
    test_ids = np.full((n_users, 6), -1, dtype=np.int32)
    test_counts = np.zeros(n_users, dtype=np.int32)
    for u in range(n_users):
        name = f"u{u}"
        n_test = rng.randint(1, 6)
        t_items = rng.choice(num_items, size=n_test, replace=False)
        origin[name] = {f"i{t}": 1.0 for t in t_items}
        preds = rng.choice(num_items, size=top_n, replace=False)
        rec_list[name] = [(f"i{p}", 1.0) for p in preds]
        pred_ids[u] = preds
        test_ids[u, :n_test] = t_items
        test_counts[u] = n_test
    host = M.parse_measure(M.ranking_measure(origin, rec_list, [5, 10]))
    dev = M.device_ranking_metrics(
        jnp.asarray(pred_ids),
        jnp.asarray(test_ids),
        jnp.asarray(test_counts),
        [5, 10],
    )
    for n in (5, 10):
        for key in ("Precision", "Recall", "F1", "NDCG"):
            assert float(dev[n][key]) == pytest.approx(
                host[f"Top {n}"][key], abs=1e-5
            ), (n, key)


def test_device_metrics_unseen_item_padding():
    # -1 entries (unseen test items) count in denominators but can't be hit
    pred_ids = jnp.asarray([[0, 1, 2]])
    test_ids = jnp.asarray([[0, -1, -1]])  # one known, one unseen item
    test_counts = jnp.asarray([2])
    dev = M.device_ranking_metrics(pred_ids, test_ids, test_counts, [3])
    assert float(dev[3]["Recall"]) == pytest.approx(0.5)
    dcg = 1 / math.log(2)
    idcg = 1 / math.log(2) + 1 / math.log(3)
    assert float(dev[3]["NDCG"]) == pytest.approx(dcg / idcg, abs=1e-6)


def test_idcg_table():
    t = M.idcg_table(3)
    assert t[0] == 0
    assert t[2] == pytest.approx(1 / math.log(2) + 1 / math.log(3))
