"""Graph model family end-to-end on planted block data."""

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
    "name,extra",
    [
        ("LightGCN", {"LightGCN": "-n_layer 2"}),
        ("NGCF", {}),
        (
            "SGL",
            {"SGL": "-n_layer 2 -lambda 0.05 -droprate 0.2 -augtype 1 -temp 0.2"},
        ),
        ("SimGCL", {"SimGCL": "-n_layer 2 -lambda 0.05 -eps 0.1"}),
    ],
)
def test_graph_model_learns_blocks(tmp_path, name, extra):
    ratings = _write_block_dataset(tmp_path)
    conf = _conf(tmp_path, ratings, name, extra)
    rec = QRec(conf, seed=3)
    measure = rec.execute()
    parsed = parse_measure(measure)
    # random recall@10 over 30 items ≈ 0.33; block structure → well above
    assert parsed["Top 10"]["Recall"] > 0.5, (name, parsed)


def test_ssl_pallas_backend_trains(tmp_path):
    """SGL trains end-to-end through the fused Pallas InfoNCE (custom-VJP
    forward + recompute backward; interpret mode on CPU) and lands within
    noise of the XLA-loss run."""
    ratings = _write_block_dataset(tmp_path)
    extra = {
        "SGL": "-n_layer 2 -lambda 0.05 -droprate 0.2 -augtype 1 -temp 0.2",
        "num.max.epoch": "15",
    }
    m_pallas = QRec(
        _conf(tmp_path, ratings, "SGL", {**extra, "ssl.backend": "pallas"}),
        seed=3,
    ).execute()
    m_xla = QRec(
        _conf(tmp_path, ratings, "SGL", {**extra, "ssl.backend": "xla"}),
        seed=3,
    ).execute()
    rp = parse_measure(m_pallas)["Top 10"]
    rx = parse_measure(m_xla)["Top 10"]
    assert rp["Recall"] > 0.5, rp
    assert abs(rp["Recall"] - rx["Recall"]) < 0.05, (rp, rx)


def test_sgl_augmentation_types(tmp_path):
    ratings = _write_block_dataset(tmp_path)
    for aug in (0, 2):
        conf = _conf(
            tmp_path,
            ratings,
            "SGL",
            {
                "SGL": f"-n_layer 2 -lambda 0.02 -droprate 0.2 -augtype {aug} -temp 0.2",
                "num.max.epoch": "10",
            },
        )
        measure = QRec(conf, seed=1).execute()
        assert parse_measure(measure)["Top 10"]["Recall"] > 0.3


def test_dense_dual_backend_matches_xla(tmp_path):
    """LightGCN trained through the single-pass dual-product Pallas kernel
    (graph.dense.dual=on, interpret mode on CPU) matches the two-matmul XLA
    dense path within bf16 accumulation-order noise."""
    ratings = _write_block_dataset(tmp_path)
    extra = {"LightGCN": "-n_layer 2", "num.max.epoch": "15"}
    m_dual = QRec(
        _conf(tmp_path, ratings, "LightGCN", {**extra, "graph.dense.dual": "on"}),
        seed=3,
    ).execute()
    m_xla = QRec(
        _conf(tmp_path, ratings, "LightGCN", {**extra, "graph.dense.dual": "off"}),
        seed=3,
    ).execute()
    rd = parse_measure(m_dual)["Top 10"]
    rx = parse_measure(m_xla)["Top 10"]
    assert rd["Recall"] > 0.5, rd
    assert abs(rd["Recall"] - rx["Recall"]) < 0.05, (rd, rx)
