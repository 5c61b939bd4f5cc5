"""Evaluation-protocol integration tests against the reference's bundled
FilmTrust pre-split files (-testSet), -val carve-out, and artifact formats."""

import os

import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.metrics import parse_measure

FILMTRUST_TRAIN = "/root/reference/dataset/FilmTrust/trainset.txt"
FILMTRUST_TEST = "/root/reference/dataset/FilmTrust/testset.txt"

needs_filmtrust = pytest.mark.skipif(
    not os.path.exists(FILMTRUST_TRAIN), reason="reference dataset not mounted"
)


@needs_filmtrust
def test_testset_protocol_filmtrust(tmp_path):
    """-testSet with the bundled 95/5 pre-split; SVD rating prediction."""
    conf = ModelConf(
        {
            "ratings": FILMTRUST_TRAIN,
            "ratings.setup": "-columns 0 1 2",
            "model.name": "SVD",
            "evaluation.setup": f"-testSet {FILMTRUST_TEST}",
            "item.ranking": "off -topN 10",
            "num.factors": "10",
            "num.max.epoch": "30",
            "batch_size": "2000",
            "learnRate": "-init 0.02 -max 1",
            "reg.lambda": "-u 0.05 -i 0.05 -b 0.05 -s 0.1",
            "output.setup": f"on -dir {tmp_path}/results/",
            "seed": "1",
        }
    )
    rec = QRec(conf, seed=1)
    measure = rec.execute()
    parsed = parse_measure(measure)["global"]
    # FilmTrust ratings are on [0.5, 4]; a trained MF should land well
    # under the trivial global-mean RMSE (~0.93 on this split)
    assert parsed["RMSE"] < 0.92, parsed
    assert parsed["MAE"] < 0.75, parsed
    files = os.listdir(tmp_path / "results")
    assert any("rating-predictions" in f for f in files)
    assert any("-measure" in f for f in files)
    # prediction file format: header + one line per test record
    pred_file = next(f for f in files if "rating-predictions" in f)
    lines = open(tmp_path / "results" / pred_file).read().splitlines()
    assert lines[0] == "userId  itemId  original  prediction"
    assert len(lines) == len(rec.model.data.test_data) + 1


@needs_filmtrust
def test_val_protocol_carves_validation(tmp_path):
    conf = ModelConf(
        {
            "ratings": FILMTRUST_TRAIN,
            "ratings.setup": "-columns 0 1 2",
            "model.name": "UserMean",
            "evaluation.setup": f"-testSet {FILMTRUST_TEST} -val 0.1",
            "item.ranking": "off -topN 10",
            "output.setup": "off -dir ./results/",
            "seed": "1",
        }
    )
    rec = QRec(conf, seed=1)
    rec.execute()
    data = rec.model.data
    # validation carve-out replaced the test set with ~10% of training
    assert len(data.test_data) == pytest.approx(33750 * 0.1, rel=0.02)
    assert len(data.training_data) + len(data.test_data) == 33750


def test_ranking_artifact_format(tmp_path):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(30):
        for i in rng.choice(20, size=8, replace=False):
            lines.append(f"u{u} i{i} 1\n")
    p = tmp_path / "r.txt"
    p.write_text("".join(lines))
    conf = ModelConf(
        {
            "ratings": str(p),
            "ratings.setup": "-columns 0 1 2",
            "model.name": "MostPopular",
            "evaluation.setup": "-ap 0.2",
            "item.ranking": "on -topN 5",
            "output.setup": f"on -dir {tmp_path}/results/",
            "seed": "3",
        }
    )
    QRec(conf, seed=3).execute()
    files = os.listdir(tmp_path / "results")
    top_file = next(f for f in files if "top-5items" in f)
    content = open(tmp_path / "results" / top_file).read().splitlines()
    # header + per-user "(item,score)" pairs with '*' hit markers
    assert content[0].startswith("userId: recommendations")
    assert all(":" in line for line in content[1:])
    assert any("*" in line for line in content[1:])
