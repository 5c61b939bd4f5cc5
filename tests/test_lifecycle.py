"""Lifecycle guarantees: NaN abort in every training mode, the config-driven
save/load path, and the BasicMF regression the round-2 verdict flagged.

Reference semantics: any iterative model aborts on NaN/Inf epoch loss
(base/iterativeRecommender.py:84-87); ``isLoadModel`` skips training and
restores a saved model, ``isSaveModel`` saves after evaluation
(base/recommender.py:186-189, 208-211).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qrec_tpu import ModelConf, QRec
from qrec_tpu.errors import ConvergenceError
from qrec_tpu.ops.metrics import parse_measure

from test_end_to_end import _conf, _write_block_dataset


# ---------------------------------------------------------------------------
# NaN abort
# ---------------------------------------------------------------------------


def _pmf(tiny_conf, tiny_data):
    from qrec_tpu.models.mf import PMF

    conf = ModelConf(dict(tiny_conf.config))
    conf["model.name"] = "PMF"
    conf["item.ranking"] = "off -topN 5"
    return PMF(conf, tiny_data)


def _nan_loss(spec):
    def bad_loss(params, batch, rng):
        return spec.loss_fn(params, batch, rng) * jnp.float32(np.nan)

    return bad_loss


def test_adam_pipelined_nan_aborts(tiny_conf, tiny_data):
    """The pipelined adam path (the default for most of the zoo) must abort
    on a NaN epoch loss — previously only bold mode checked."""
    m = _pmf(tiny_conf, tiny_data)
    spec = m.build()
    with pytest.raises(ConvergenceError):
        m.run_training(
            spec.params,
            _nan_loss(spec),
            spec.sampler,
            mode="adam",
            track_best=False,
        )


def test_adam_synced_nan_aborts(tiny_conf, tiny_data):
    """The per-epoch-synced adam path (rating_eval active) also aborts."""
    m = _pmf(tiny_conf, tiny_data)
    spec = m.build()
    with pytest.raises(ConvergenceError):
        m.run_training(
            spec.params,
            _nan_loss(spec),
            spec.sampler,
            mode="adam",
            track_best=False,
            rating_eval=lambda p: {},
        )


def test_basicmf_diverging_lr_aborts(tmp_path):
    """A diverging learning rate on BasicMF (the exact case from commit
    d8cc608) must abort with a clear error instead of training on garbage."""
    ratings = _write_block_dataset(tmp_path, implicit=False)
    conf = _conf(
        tmp_path,
        ratings,
        **{
            "model.name": "BasicMF",
            "item.ranking": "off -topN 5",
            "num.max.epoch": "40",
            "learnRate": "-init 500 -max 1000",
        },
    )
    with pytest.raises(ConvergenceError):
        QRec(conf, seed=2).execute()


def test_basicmf_trains_sanely(tmp_path):
    """BasicMF regression: with sane settings it must beat the global-mean
    baseline on the planted block dataset."""
    ratings = _write_block_dataset(tmp_path, implicit=False)
    conf = _conf(
        tmp_path,
        ratings,
        **{
            "model.name": "BasicMF",
            "item.ranking": "off -topN 5",
            "num.max.epoch": "30",
            "learnRate": "-init 0.02 -max 1",
        },
    )
    measure = QRec(conf, seed=2).execute()
    parsed = parse_measure(measure)["global"]
    assert np.isfinite(parsed["RMSE"])
    assert parsed["RMSE"] < 1.6


# ---------------------------------------------------------------------------
# config-driven save/load lifecycle
# ---------------------------------------------------------------------------


def test_save_load_roundtrip_identical_measure(tmp_path):
    """fit → save, then a fresh session with ``model.setup=-load`` (skipping
    training entirely) must reproduce the identical measure."""
    ratings = _write_block_dataset(tmp_path)
    path = str(tmp_path / "ckpt" / "bpr_model")
    conf = _conf(tmp_path, ratings, **{"model.setup": f"-save {path}"})
    m1 = QRec(conf, seed=3).execute()

    conf2 = _conf(tmp_path, ratings, **{"model.setup": f"-load {path}"})
    m2 = QRec(conf2, seed=3).execute()
    assert m1 == m2


def test_save_load_roundtrip_svd_extra_state(tmp_path):
    """SVD carries bias vectors beyond U/V — the round trip must restore
    them (identical rating measure)."""
    ratings = _write_block_dataset(tmp_path, implicit=False)
    path = str(tmp_path / "svd_model")
    over = {
        "model.name": "SVD",
        "item.ranking": "off -topN 5",
        "num.max.epoch": "10",
        "learnRate": "-init 0.02 -max 1",
    }
    conf = _conf(tmp_path, ratings, **dict(over, **{"model.setup": f"-save {path}"}))
    m1 = QRec(conf, seed=2).execute()
    conf2 = _conf(tmp_path, ratings, **dict(over, **{"model.setup": f"-load {path}"}))
    m2 = QRec(conf2, seed=2).execute()
    assert m1 == m2


def test_load_missing_file_raises(tmp_path):
    ratings = _write_block_dataset(tmp_path)
    conf = _conf(
        tmp_path, ratings, **{"model.setup": f"-load {tmp_path}/nonexistent"}
    )
    with pytest.raises(FileNotFoundError):
        QRec(conf, seed=3).execute()


def test_tf_flag_selects_adam_path(tmp_path, capsys):
    """``evaluation.setup ... -tf`` routes a bold-driver model through the
    fixed-LR Adam path (the reference's trainModel_tf switch,
    base/recommender.py:194-201): the printed learning rate stays constant
    instead of following the x1.05/x0.5 bold-driver schedule."""
    ratings = _write_block_dataset(tmp_path, implicit=False)
    over = {
        "model.name": "BasicMF",
        "item.ranking": "off -topN 5",
        "num.max.epoch": "6",
        "learnRate": "-init 0.02 -max 1",
    }

    def lrs(evaluation):
        conf = _conf(tmp_path, ratings, **dict(over, **{"evaluation.setup": evaluation}))
        QRec(conf, seed=2).execute()
        out = capsys.readouterr().out
        return [
            line.split("learning_rate = ")[1].split(" ")[0]
            for line in out.splitlines()
            if "learning_rate" in line
        ]

    bold_lrs = lrs("-ap 0.2")
    assert len(set(bold_lrs)) > 1  # bold driver adapts
    tf_lrs = lrs("-ap 0.2 -tf")
    assert len(set(tf_lrs)) == 1  # fixed-LR Adam
