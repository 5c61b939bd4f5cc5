"""Social model family end-to-end: block data plus a social graph whose
edges connect users within the same block."""

import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.ops.metrics import parse_measure


def _write_social_dataset(tmp_path, implicit=False):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(40):
        block = 0 if u < 20 else 1
        items = rng.choice(15, size=10, replace=False) + block * 15
        for i in items:
            r = 1 if implicit else rng.randint(3, 6)
            lines.append(f"u{u} i{i} {r}\n")
    rp = tmp_path / "ratings.txt"
    rp.write_text("".join(lines))
    trust = []
    for u in range(40):
        block_lo = 0 if u < 20 else 20
        friends = rng.choice(20, size=3, replace=False) + block_lo
        for f in friends:
            if f != u:
                trust.append(f"u{u} u{f} 1\n")
    tp = tmp_path / "trust.txt"
    tp.write_text("".join(trust))
    return str(rp), str(tp)


def _conf(tmp_path, ratings, trust, name, extra=None):
    base = {
        "ratings": ratings,
        "ratings.setup": "-columns 0 1 2",
        "social": trust,
        "social.setup": "-columns 0 1 2",
        "model.name": name,
        "evaluation.setup": "-ap 0.2",
        "item.ranking": "off -topN 10",
        "num.factors": "8",
        "num.max.epoch": "25",
        "batch_size": "64",
        "learnRate": "-init 0.02 -max 1",
        "reg.lambda": "-u 0.01 -i 0.01 -b 0.1 -s 0.1",
        "output.setup": "off -dir ./results/",
        "seed": "7",
    }
    if extra:
        base.update(extra)
    return ModelConf(base)


RATING_MODELS = [
    ("SoRec", {"SoRec": "-z 0.01"}, 1.6),
    ("SoReg", {"SoReg": "-alpha 0.1"}, 1.6),
    ("SocialMF", {}, 1.6),
    ("RSTE", {"RSTE": "-alpha 0.7"}, 1.7),
    ("LOCABAL", {"LOCABAL": "-alpha 0.2"}, 1.7),
    ("SREE", {"SREE": "-alpha 0.02", "learnRate": "-init 0.01 -max 1"}, 1.7),
    (
        "SocialFD",
        {"SocialFD": "-alpha 0.02 -eta 0.1 -beta 0.1", "learnRate": "-init 0.005 -max 1"},
        1.8,
    ),
]


@pytest.mark.parametrize("name,extra,ceil", RATING_MODELS)
def test_social_rating_models(tmp_path, name, extra, ceil):
    ratings, trust = _write_social_dataset(tmp_path)
    conf = _conf(tmp_path, ratings, trust, name, extra)
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)["global"]
    assert parsed["RMSE"] < ceil, (name, parsed)


@pytest.mark.parametrize(
    "name,extra",
    [
        ("SBPR", {}),
        ("TBPR", {"TBPR": "-regT 0.01"}),
    ],
)
def test_social_ranking_models(tmp_path, name, extra):
    ratings, trust = _write_social_dataset(tmp_path, implicit=True)
    extra = dict(extra)
    extra.update(
        {"item.ranking": "on -topN 10", "learnRate": "-init 0.05 -max 1",
         "num.max.epoch": "30"}
    )
    conf = _conf(tmp_path, ratings, trust, name, extra)
    measure = QRec(conf, seed=3).execute()
    parsed = parse_measure(measure)
    assert parsed["Top 10"]["Recall"] > 0.5, (name, parsed)


def test_social_model_without_relations_raises(tmp_path):
    ratings, trust = _write_social_dataset(tmp_path)
    conf = _conf(tmp_path, ratings, trust, "SocialMF")
    del conf.config["social"]
    from qrec_tpu.errors import ConfigError

    with pytest.raises(ConfigError):
        QRec(conf, seed=1).execute()
