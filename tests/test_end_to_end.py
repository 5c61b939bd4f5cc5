"""End-to-end session tests: config file → QRec → train → eval artifacts.

Uses a planted two-block dataset: users 0..19 like items 0..14, users 20..39
like items 15..29. A working ranking model must recover the block structure
(recall far above random); rating models must beat the global-mean baseline.
"""

import os

import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.metrics import parse_measure


def _write_block_dataset(tmp_path, implicit=True):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            r = 1 if implicit else rng.randint(3, 6)
            lines.append(f"u{u} i{i} {r}\n")
    p = tmp_path / "ratings.txt"
    p.write_text("".join(lines))
    return str(p)


def _conf(tmp_path, ratings, **over):
    base = {
        "ratings": ratings,
        "ratings.setup": "-columns 0 1 2",
        "model.name": "BPR",
        "evaluation.setup": "-ap 0.2",
        "item.ranking": "on -topN 5,10",
        "num.factors": "16",
        "num.max.epoch": "30",
        "batch_size": "64",
        "learnRate": "-init 0.05 -max 1",
        "reg.lambda": "-u 0.01 -i 0.01 -b 0.1 -s 0.1",
        "output.setup": f"on -dir {tmp_path}/results/",
        "seed": "7",
    }
    base.update(over)
    return ModelConf(base)


def test_bpr_end_to_end_learns_blocks(tmp_path):
    ratings = _write_block_dataset(tmp_path)
    conf = _conf(tmp_path, ratings)
    rec = QRec(conf, seed=3)
    measure = rec.execute()
    parsed = parse_measure(measure)
    # random recall@10 over 30 items ≈ 0.33; planted blocks → well above
    assert parsed["Top 10"]["Recall"] > 0.5
    # artifacts written
    results = os.listdir(tmp_path / "results")
    assert any("top-10items" in f for f in results)
    assert any("-measure" in f for f in results)


def test_mostpopular_and_rand_run(tmp_path):
    ratings = _write_block_dataset(tmp_path)
    for name in ("MostPopular", "Rand"):
        conf = _conf(tmp_path, ratings, **{"model.name": name})
        measure = QRec(conf, seed=1).execute()
        parsed = parse_measure(measure)
        assert 0 <= parsed["Top 10"]["Recall"] <= 1


def test_svd_rating_prediction(tmp_path):
    ratings = _write_block_dataset(tmp_path, implicit=False)
    conf = _conf(
        tmp_path,
        ratings,
        **{
            "model.name": "SVD",
            "item.ranking": "off -topN 5",
            "num.max.epoch": "20",
            "learnRate": "-init 0.02 -max 1",
        },
    )
    rec = QRec(conf, seed=2)
    measure = rec.execute()
    parsed = parse_measure(measure)["global"]
    assert parsed["MAE"] < 1.2
    assert parsed["RMSE"] < 1.6


def test_pmf_rating_prediction(tmp_path):
    ratings = _write_block_dataset(tmp_path, implicit=False)
    conf = _conf(
        tmp_path,
        ratings,
        **{
            "model.name": "PMF",
            "item.ranking": "off -topN 5",
            "num.max.epoch": "20",
            "learnRate": "-init 0.02 -max 1",
        },
    )
    measure = QRec(conf, seed=2).execute()
    parsed = parse_measure(measure)["global"]
    assert parsed["RMSE"] < 1.8


def test_cross_validation_averaging(tmp_path):
    ratings = _write_block_dataset(tmp_path)
    conf = _conf(
        tmp_path,
        ratings,
        **{
            "model.name": "MostPopular",
            "evaluation.setup": "-cv 3",
        },
    )
    rec = QRec(conf, seed=1)
    res = rec.execute()
    parsed = parse_measure(res)
    assert "Top 5" in parsed and "Top 10" in parsed
    assert any("-fold-cv" in f for f in os.listdir(tmp_path / "results"))


def test_user_item_mean_baselines(tmp_path):
    ratings = _write_block_dataset(tmp_path, implicit=False)
    for name in ("UserMean", "ItemMean"):
        conf = _conf(
            tmp_path,
            ratings,
            **{"model.name": name, "item.ranking": "off -topN 5"},
        )
        measure = QRec(conf, seed=1).execute()
        parsed = parse_measure(measure)["global"]
        assert parsed["RMSE"] < 2.0


def test_predict_mode_writes_lists_only(tmp_path):
    ratings = _write_block_dataset(tmp_path)
    userlist = tmp_path / "users.txt"
    userlist.write_text("u1\nu2\n")
    conf = _conf(
        tmp_path,
        ratings,
        **{
            "model.name": "MostPopular",
            "evaluation.setup": f"-predict {userlist}",
        },
    )
    rec = QRec(conf, seed=1)
    measure = rec.execute()
    assert measure == []
    results = os.listdir(tmp_path / "results")
    assert any("top-10items" in f for f in results)


def test_chunked_eval_dispatch_matches_per_epoch(tmp_path):
    """The device-resident quick-eval + majority-vote chunked runner
    (trainer.make_chunk_eval_runner) must reproduce the per-epoch host
    loop exactly: same best metrics, same best epoch, same final measure
    (train.chunk=1 forces the host loop; auto uses the device chain)."""
    ratings = _write_block_dataset(tmp_path)

    def run(chunk):
        conf = _conf(
            tmp_path,
            ratings,
            **{
                "model.name": "LightGCN",
                "LightGCN": "-n_layer 2",
                "num.max.epoch": "11",
                "train.chunk": chunk,
                "output.setup": "off -dir ./results/",
            },
        )
        rec = QRec(conf, seed=3)
        return parse_measure(rec.execute())

    host = run("1")
    dev = run("auto")
    for block in host:
        for k, v in host[block].items():
            assert dev[block][k] == pytest.approx(v, abs=1e-6), (block, k)
