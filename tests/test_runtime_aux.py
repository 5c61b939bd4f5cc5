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


def _mf_conf(tmp_path, ratings_path, extra=None):
    from qrec_tpu.config import ModelConf

    cfg = {
        "ratings": str(ratings_path),
        "ratings.setup": "-columns 0 1 2",
        "model.name": "PMF",
        "evaluation.setup": "-ap 0.2",
        "item.ranking": "off -topN -1",
        "num.factors": "8",
        "num.max.epoch": "6",
        "batch_size": "32",
        "learnRate": "-init 0.02 -max 1",
        "reg.lambda": "-u 0.01 -i 0.01 -b 0.1 -s 0.1",
        "output.setup": "off -dir ./results/",
        "seed": "11",
    }
    if extra:
        cfg.update(extra)
    return ModelConf(cfg)


def _write_ratings(tmp_path):
    rng = np.random.RandomState(0)
    lines = []
    for u in range(30):
        for i in rng.choice(20, size=8, replace=False):
            lines.append(f"u{u} i{i} {rng.randint(1, 6)}\n")
    p = tmp_path / "ratings.txt"
    p.write_text("".join(lines))
    return p


def test_kill_and_resume_matches_uninterrupted(tmp_path):
    """checkpoint.setup=on: a run killed mid-training and resumed from the
    latest checkpoint produces bit-identical final params to an
    uninterrupted run (params, optimizer state, LR schedule, and the RNG
    stream are all restored)."""
    from qrec_tpu import QRec

    p = _write_ratings(tmp_path)
    ckdir = tmp_path / "ck"

    # "killed" run: checkpoint every 2 epochs, stop after epoch 3
    conf_a = _mf_conf(
        tmp_path, p, {"checkpoint.setup": f"on -dir {ckdir} -every 2"}
    )
    rec_a = QRec(conf_a, seed=3)
    from qrec_tpu.data.dataset import Interactions
    from qrec_tpu.models import get_model

    data = Interactions(conf_a, rec_a.training_data, rec_a.test_data, seed=3)
    m = get_model("PMF")(conf_a, data)
    spec = m.build()
    m.run_training(
        spec.params, spec.loss_fn, spec.sampler, mode=spec.mode,
        track_best=False, max_epoch=3,
    )
    # resumed run: fresh model, full 6 epochs, same checkpoint dir
    m2 = get_model("PMF")(conf_a, data)
    spec2 = m2.build()
    params2 = m2.run_training(
        spec2.params, spec2.loss_fn, spec2.sampler, mode=spec2.mode,
        track_best=False,
    )
    m2.finalize(params2, spec2)

    # reference run on the SAME data split (QRec full path above re-split;
    # rebuild the uninterrupted run on this exact Interactions object)
    m3 = get_model("PMF")(_mf_conf(tmp_path, p), data)
    spec3 = m3.build()
    params3 = m3.run_training(
        spec3.params, spec3.loss_fn, spec3.sampler, mode=spec3.mode,
        track_best=False,
    )
    m3.finalize(params3, spec3)
    assert np.array_equal(np.asarray(m2.U), np.asarray(m3.U))
    assert np.array_equal(np.asarray(m2.V), np.asarray(m3.V))


def test_rating_mode_epoch_line_shows_mae_rmse(tmp_path, capsys):
    """Rating models print MAE/RMSE on each epoch line, matching the
    reference's observable surface (base/iterativeRecommender.py:91-94)."""
    from qrec_tpu import QRec

    p = _write_ratings(tmp_path)
    rec = QRec(_mf_conf(tmp_path, p), seed=3)
    rec.execute()
    out = capsys.readouterr().out
    epoch_lines = [l for l in out.splitlines() if "epoch 1:" in l]
    assert epoch_lines and "MAE:" in epoch_lines[0] and "RMSE:" in epoch_lines[0]
    assert "ex/s]" in epoch_lines[0]


def test_cv_summary_written_unconditionally(tmp_path):
    """The reference writes the k-fold CV summary file regardless of the
    output.setup main switch (QRec.py:103-106)."""
    import os

    from qrec_tpu import QRec

    p = _write_ratings(tmp_path)
    out_dir = tmp_path / "cvout"
    conf = _mf_conf(
        tmp_path, p,
        {
            "evaluation.setup": "-cv 2",
            "num.max.epoch": "2",
            "output.setup": f"off -dir {out_dir}/",
        },
    )
    rec = QRec(conf, seed=3)
    rec.execute()
    files = os.listdir(out_dir)
    assert any("fold-cv" in f for f in files), files


def test_cv_parallel_folds_match_sequential(tmp_path):
    """evaluation.setup ... -p runs folds as concurrent spawned processes
    (QRec.py:82-89) and averages to the same result as sequential folds."""
    from qrec_tpu import QRec

    p = _write_ratings(tmp_path)
    out_dir = tmp_path / "cvout"
    base = {
        "evaluation.setup": "-cv 2",
        "num.max.epoch": "2",
        "output.setup": f"off -dir {out_dir}/",
    }
    seq = QRec(_mf_conf(tmp_path, p, base), seed=3).execute()
    par = QRec(
        _mf_conf(tmp_path, p, {**base, "evaluation.setup": "-cv 2 -p"}),
        seed=3,
    ).execute()
    assert seq == par


def test_best_tracker_majority_vote():
    bt = BestTracker()
    m1 = {"Precision": 0.1, "Recall": 0.1, "F1": 0.1, "NDCG": 0.1}
    assert bt.update(0, m1)
    worse = {"Precision": 0.05, "Recall": 0.05, "F1": 0.2, "NDCG": 0.05}
    assert not bt.update(1, worse)
    better = {"Precision": 0.2, "Recall": 0.2, "F1": 0.05, "NDCG": 0.2}
    assert bt.update(2, better)
    assert bt.best_epoch == 3


def test_chunk_runner_matches_epoch_loop():
    """make_chunk_runner (sampler folded into one jit, scan over epochs)
    must be bit-identical to E calls of make_epoch_runner with the same
    per-epoch (sampler_rng, step_rng) keys."""
    import jax
    import optax

    from qrec_tpu.runtime.trainer import make_chunk_runner, make_epoch_runner

    n, d, bs, nb, E = 40, 4, 8, 5, 3
    w0 = jnp.asarray(np.random.RandomState(0).randn(n, d).astype(np.float32))

    @jax.jit
    def sampler(rng):
        idx = jax.random.randint(rng, (nb, bs), 0, n)
        tgt = jax.random.normal(jax.random.fold_in(rng, 1), (nb, bs, d))
        return idx, tgt

    def loss_fn(params, batch, rng):
        idx, tgt = batch
        noise = jax.random.normal(rng, tgt.shape) * 0.01
        return jnp.sum((params["w"][idx] - tgt + noise) ** 2)

    opt = optax.adam(1e-2)
    params_a = {"w": w0}
    state_a = opt.init(params_a)
    run_epoch = make_epoch_runner(loss_fn, opt)
    rng = jax.random.PRNGKey(7)
    pairs, losses_a = [], []
    for _ in range(E):
        rng, rs, rt = jax.random.split(rng, 3)
        pairs.append(jnp.stack([rs, rt]))
        batches = sampler(rs)
        params_a, state_a, loss = run_epoch(params_a, state_a, batches, rt)
        losses_a.append(float(loss))

    run_chunk = make_chunk_runner(loss_fn, opt, sampler)
    params_b, _, losses_b = run_chunk({"w": w0}, opt.init({"w": w0}), jnp.stack(pairs))
    np.testing.assert_array_equal(np.asarray(losses_b), np.asarray(losses_a, np.float32))
    np.testing.assert_array_equal(np.asarray(params_b["w"]), np.asarray(params_a["w"]))


def _ranking_conf(tmp_path, ratings_path, extra=None):
    from qrec_tpu.config import ModelConf

    cfg = {
        "ratings": str(ratings_path),
        "ratings.setup": "-columns 0 1 2",
        "model.name": "LightGCN",
        "LightGCN": "-n_layer 2",
        "evaluation.setup": "-ap 0.2 -b 1",
        "item.ranking": "on -topN 10",
        "num.factors": "8",
        "num.max.epoch": "10",
        "batch_size": "32",
        "learnRate": "-init 0.02 -max 1",
        "reg.lambda": "-u 0.01 -i 0.01 -b 0.1 -s 0.1",
        "output.setup": "off -dir ./results/",
        "seed": "11",
    }
    if extra:
        cfg.update(extra)
    return ModelConf(cfg)


def _fit_lightgcn(tmp_path, ratings, chunk, track_best):
    from qrec_tpu import QRec
    from qrec_tpu.data.dataset import Interactions
    from qrec_tpu.models import get_model

    conf = _ranking_conf(tmp_path, ratings, {"train.chunk": chunk})
    rec = QRec(conf, seed=3)
    data = Interactions(conf, rec.training_data, rec.test_data, seed=3)
    m = get_model("LightGCN")(conf, data)
    m.track_best = track_best
    m.fit()
    return m


def test_chunked_midrun_failure_resumes_bit_identical(tmp_path, monkeypatch, capsys):
    """A chunked dispatch that fails AFTER >=1 completed chunk (here: the
    retrace of the final partial chunk) must hand the per-epoch loop the
    state at the last completed chunk boundary — final params bit-identical
    to the never-chunked run (VERDICT r4 weak #3)."""
    import qrec_tpu.runtime.trainer as T

    ratings = _write_ratings(tmp_path)
    clean = _fit_lightgcn(tmp_path, ratings, "1", track_best=False)

    real = T.make_chunk_runner

    def patched(*a, **k):
        runner = real(*a, **k)

        def wrapper(params, opt_state, pairs, *c):
            if pairs.shape[0] != 4:  # 10 epochs / chunk 4 → fails on the 2-chunk
                raise RuntimeError("injected retrace failure")
            return runner(params, opt_state, pairs, *c)

        return wrapper

    monkeypatch.setattr(T, "make_chunk_runner", patched)
    broken = _fit_lightgcn(tmp_path, ratings, "4", track_best=False)
    out = capsys.readouterr().out
    assert "using per-epoch loop" in out
    # epochs 1-8 ran chunked, 9-10 per-epoch — all ten epoch lines printed
    assert "epoch 10:" in out
    np.testing.assert_array_equal(np.asarray(broken.U), np.asarray(clean.U))
    np.testing.assert_array_equal(np.asarray(broken.V), np.asarray(clean.V))


def test_chunked_eval_midrun_failure_resumes_bit_identical(tmp_path, monkeypatch, capsys):
    """Same contract for the fused-eval strategy: the device-side best vote
    from completed chunks is written back and the per-epoch loop continues
    the vote seamlessly — same final measure as the never-chunked run."""
    import qrec_tpu.runtime.trainer as T

    ratings = _write_ratings(tmp_path)
    clean = _fit_lightgcn(tmp_path, ratings, "1", track_best=True)

    real = T.make_chunk_eval_runner

    def patched(*a, **k):
        runner = real(*a, **k)

        def wrapper(params, opt_state, pairs, *rest):
            if pairs.shape[0] != 4:
                raise RuntimeError("injected retrace failure")
            return runner(params, opt_state, pairs, *rest)

        return wrapper

    monkeypatch.setattr(T, "make_chunk_eval_runner", patched)
    broken = _fit_lightgcn(tmp_path, ratings, "4", track_best=True)
    out = capsys.readouterr().out
    assert "using per-epoch loop" in out
    np.testing.assert_array_equal(np.asarray(broken.U), np.asarray(clean.U))
    np.testing.assert_array_equal(np.asarray(broken.V), np.asarray(clean.V))
