"""Auxiliary runtime subsystems: checkpointing, profiling, NaN guard."""

import jax.numpy as jnp
import numpy as np
import pytest

from qrec_tpu.runtime.checkpoint import Checkpointer, from_config
from qrec_tpu.runtime.profiling import StepTimer
from qrec_tpu.runtime.trainer import BestTracker, BoldDriver, ConvergenceMonitor


def test_checkpoint_roundtrip(tmp_path):
    ckpt = Checkpointer(str(tmp_path / "ck"), max_to_keep=2)
    state = {
        "params": {"w": jnp.arange(6.0).reshape(2, 3)},
        "epoch": jnp.asarray(4),
    }
    ckpt.save(4, state)
    ckpt.save(7, state)
    assert ckpt.latest_step() == 7
    restored = ckpt.restore(template=state)
    assert np.allclose(np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3))


def test_checkpoint_from_config(tmp_path):
    from qrec_tpu.config import ModelConf

    conf = ModelConf({"checkpoint.setup": f"on -dir {tmp_path}/c -every 5"})
    ck = from_config(conf)
    assert ck is not None
    conf_off = ModelConf({"checkpoint.setup": "off -dir ./x"})
    assert from_config(conf_off) is None
    assert from_config(ModelConf({})) is None


def test_step_timer():
    t = StepTimer(examples_per_epoch=100)
    for _ in range(3):
        with t:
            pass
    s = t.summary()
    assert s["epochs"] == 3
    assert s["examples_per_second"] > 0


def test_convergence_nan_abort():
    from qrec_tpu.errors import ConvergenceError

    mon = ConvergenceMonitor()
    assert not mon.check(10.0)
    assert mon.check(10.0005)  # |delta| < 1e-3
    with pytest.raises(ConvergenceError):
        mon.check(float("nan"))


def test_bold_driver_schedule():
    bd = BoldDriver(0.1, 0.5)
    assert bd.update(1, 5.0) == pytest.approx(0.1)  # first epoch unchanged
    bd.last_loss = 5.0
    lr = bd.update(2, 4.0)  # improved → ×1.05
    assert lr == pytest.approx(0.105)
    bd.last_loss = 4.0
    lr = bd.update(3, 6.0)  # worsened → ×0.5
    assert lr == pytest.approx(0.0525)


def test_best_tracker_majority_vote():
    bt = BestTracker()
    m1 = {"Precision": 0.1, "Recall": 0.1, "F1": 0.1, "NDCG": 0.1}
    assert bt.update(0, m1)
    worse = {"Precision": 0.05, "Recall": 0.05, "F1": 0.2, "NDCG": 0.05}
    assert not bt.update(1, worse)
    better = {"Precision": 0.2, "Recall": 0.2, "F1": 0.05, "NDCG": 0.2}
    assert bt.update(2, better)
    assert bt.best_epoch == 3
