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
