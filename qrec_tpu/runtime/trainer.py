"""Jitted training-loop machinery shared by all iterative models.

One functional training loop replaces the reference's 40+ hand-rolled
per-model loops: a jitted ``lax.scan`` over device-resident epoch batches
(gradient + optax update per step), with host-side epoch hooks implementing
the reference's control policies:

* bold-driver learning-rate adaptation — ×1.05 on loss decrease, ×0.5 on
  increase, capped by maxLRate (base/iterativeRecommender.py:56-63);
* convergence check ``|Δloss| < 1e-3`` and NaN abort
  (base/iterativeRecommender.py:82-102);
* per-epoch quick ranking evaluation with majority-vote best-model tracking
  and snapshot restore (base/iterativeRecommender.py:115-185).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from ..errors import ConvergenceError
from ..ops.metrics import device_ranking_metrics


def make_epoch_runner(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    donate: bool = False,
):
    """Build a jitted epoch function.

    ``loss_fn(params, batch, rng) -> scalar``; ``batch`` is a pytree whose
    leaves have leading dim ``num_batches``. Returns
    ``run_epoch(params, opt_state, batches, rng) -> (params, opt_state, loss)``
    where ``loss`` is the epoch total.

    ``donate=True`` donates the params/opt_state input buffers to XLA so the
    update happens in place — at production table scale (the embedding
    tables plus two Adam moments are the only large state) this halves the
    transient HBM footprint of every epoch. Callers must treat the inputs
    as CONSUMED: snapshot with ``jnp.copy`` before the next call (the
    training loop's best-params tracker does).
    """

    def run_epoch(params, opt_state, batches, rng):
        num_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
        rngs = jax.random.split(rng, num_batches)

        def step(carry, xs):
            params, opt_state = carry
            batch, step_rng = xs
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, step_rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (batches, rngs)
        )
        return params, opt_state, jnp.sum(losses)

    if donate:
        return jax.jit(run_epoch, donate_argnums=(0, 1))
    return jax.jit(run_epoch)


def make_chunk_runner(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    sampler: Callable,
    donate: bool = False,
):
    """Build a jitted MULTI-epoch runner: the sampler is folded into the jit
    and a ``lax.scan`` runs E epochs per dispatch, so the per-epoch host
    dispatch gap (measured ~5.5 ms/epoch through the remote-TPU tunnel,
    scripts/profile_epoch.py) is paid once per chunk instead of once per
    epoch.

    ``rng_pairs`` is an (E, 2, 2) uint32 stack of per-epoch
    ``(sampler_rng, step_rng)`` keys — the caller derives them with exactly
    the same ``jax.random.split`` sequence as the one-epoch loop, so losses
    and final params are bit-identical to E unchunked epochs. Returns
    ``(params, opt_state, losses[E])``."""

    def run_chunk(params, opt_state, rng_pairs):
        def epoch_body(carry, pair):
            params, opt_state = carry
            batches = sampler(pair[0])
            num_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
            step_rngs = jax.random.split(pair[1], num_batches)

            def step(c, xs):
                p, o = c
                batch, step_rng = xs
                loss, grads = jax.value_and_grad(loss_fn)(p, batch, step_rng)
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (batches, step_rngs)
            )
            return (params, opt_state), jnp.sum(losses)

        (params, opt_state), losses = jax.lax.scan(
            epoch_body, (params, opt_state), rng_pairs
        )
        return params, opt_state, losses

    if donate:
        return jax.jit(run_chunk, donate_argnums=(0, 1))
    return jax.jit(run_chunk)


# fixed metric order for device-side best tracking — matches the dict
# insertion order of ops.metrics.device_ranking_metrics / quick_eval_metrics
METRIC_KEYS = ("Precision", "Recall", "F1", "NDCG")


def make_chunk_eval_runner(
    loss_fn: Callable,
    optimizer: optax.GradientTransformation,
    sampler: Callable,
    eval_metrics_fn: Callable,
    donate: bool = False,
):
    """Chunked multi-epoch runner with DEVICE-RESIDENT quick evaluation and
    majority-vote best-model tracking.

    The reference evaluates the ranking model every epoch and keeps the
    best by a metric majority vote (iterativeRecommender.py:115-169); the
    host-loop equivalent costs several device→host syncs per epoch —
    ~975 ms/epoch wall over the remote-TPU tunnel for a 21 ms training
    epoch. Here the whole (train epoch → encode → full-catalog top-k →
    metrics → vote → best-params select) chain runs inside one
    ``lax.scan`` over E epochs; the host syncs once per chunk.

    ``eval_metrics_fn(params) -> (len(METRIC_KEYS),) f32`` in METRIC_KEYS
    order. The vote replicates BestTracker.update exactly: count =
    Σ(best > new) − Σ(best ≤ new), win iff count < 0; seeding ``best_vec``
    with −inf makes the first epoch always win. ``epoch_ids`` carries the
    absolute epoch index (local epoch + tracker offset); the stored best
    epoch is ``epoch_id + 1`` like BestTracker.

    Losses and final params are bit-identical to the per-epoch loop — the
    per-epoch (sampler_rng, step_rng) pairs use the identical split
    sequence (see make_chunk_runner).
    """

    def run(params, opt_state, rng_pairs, epoch_ids, best_params, best_vec,
            best_epoch):
        def epoch_body(carry, xs):
            params, opt_state, best_params, best_vec, best_epoch = carry
            pair, eid = xs
            batches = sampler(pair[0])
            num_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
            step_rngs = jax.random.split(pair[1], num_batches)

            def step(c, sx):
                p, o = c
                batch, step_rng = sx
                loss, grads = jax.value_and_grad(loss_fn)(p, batch, step_rng)
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (batches, step_rngs)
            )
            vec = eval_metrics_fn(params)
            count = jnp.sum(jnp.where(best_vec > vec, 1, -1))
            win = count < 0
            best_params = jax.tree_util.tree_map(
                lambda b, p: jnp.where(win, p, b), best_params, params
            )
            best_vec = jnp.where(win, vec, best_vec)
            best_epoch = jnp.where(win, eid + 1, best_epoch)
            return (
                (params, opt_state, best_params, best_vec, best_epoch),
                (jnp.sum(losses), vec),
            )

        (params, opt_state, best_params, best_vec, best_epoch), (
            losses,
            metrics,
        ) = jax.lax.scan(
            epoch_body,
            (params, opt_state, best_params, best_vec, best_epoch),
            (rng_pairs, epoch_ids),
        )
        return params, opt_state, losses, metrics, best_params, best_vec, best_epoch

    if donate:
        return jax.jit(run, donate_argnums=(0, 1))
    return jax.jit(run)


class BoldDriver:
    """Epoch-level LR schedule from the reference
    (base/iterativeRecommender.py:56-63)."""

    def __init__(self, init_lr: float, max_lr: float):
        self.lr = init_lr
        self.max_lr = max_lr
        self.last_loss = 0.0

    def update(self, epoch: int, loss: float) -> float:
        if epoch > 1:
            if abs(self.last_loss) > abs(loss):
                self.lr *= 1.05
            else:
                self.lr *= 0.5
        if self.lr > self.max_lr > 0:
            self.lr = self.max_lr
        return self.lr


class BestTracker:
    """Majority-vote best-epoch tracking (base/iterativeRecommender.py:132-169).

    ``update`` returns True when the new metrics win the vote (strictly more
    metrics improved than worsened) — the caller then snapshots params.
    """

    def __init__(self):
        self.best_epoch: Optional[int] = None
        self.best_metrics: Optional[Dict[str, float]] = None
        # snapshot of the winning params, set by the training loop; lives on
        # the tracker so multi-phase fits (SEPT warm-up → joint) can share
        # one tracker and restore the best across ALL epochs, matching the
        # reference's single bestU/bestV (SGL.py:281, SEPT.py:282-310)
        self.best_params = None
        self.epoch_offset = 0  # cumulative epochs from earlier phases

    def update(self, epoch: int, metrics: Dict[str, float]) -> bool:
        if self.best_metrics is None:
            self.best_epoch = epoch + 1
            self.best_metrics = dict(metrics)
            return True
        count = 0
        for k in self.best_metrics:
            if self.best_metrics[k] > metrics[k]:
                count += 1
            else:
                count -= 1
        if count < 0:
            self.best_epoch = epoch + 1
            self.best_metrics = dict(metrics)
            return True
        return False


def check_finite(loss: float) -> None:
    """NaN/Inf abort for EVERY iterative model — the reference kills any
    run whose epoch loss diverges (base/iterativeRecommender.py:84-87), not
    just the bold-driver family. Called at each point where the epoch loss
    is materialized on the host (per-epoch in sync modes; lag-1 in the
    pipelined adam path, which is the earliest the loss exists host-side)."""
    if math.isnan(loss) or math.isinf(loss):
        raise ConvergenceError(
            "Loss = NaN or Infinity: current settings does not fit the "
            "recommender! Change the settings and try again!"
        )


class ConvergenceMonitor:
    """``|Δloss| < 1e-3`` + NaN abort (base/iterativeRecommender.py:82-102)."""

    def __init__(self, tol: float = 1e-3):
        self.tol = tol
        self.last_loss = 0.0

    def check(self, loss: float) -> bool:
        check_finite(loss)
        delta = self.last_loss - loss
        converged = abs(delta) < self.tol
        self.last_loss = loss
        return converged


def quick_eval_vector(ranker, score_fn, params, top_n: int) -> jnp.ndarray:
    """Device-resident quick eval: METRIC_KEYS-ordered (4,) f32 vector —
    the traceable core of :func:`quick_eval_metrics`, used inside the
    chunked eval runner's scan."""
    ids, _ = ranker.topk_device(score_fn, params)
    dev = device_ranking_metrics(
        ids,
        jnp.asarray(ranker.test_ids),
        jnp.asarray(ranker.test_counts),
        [top_n],
    )[top_n]
    return jnp.stack([dev[k] for k in METRIC_KEYS]).astype(jnp.float32)


def quick_eval_metrics(
    ranker,
    score_fn,
    params,
    top_n: int,
) -> Dict[str, float]:
    """On-device quick ranking eval at N=max(topN) — the per-epoch evaluation
    the reference runs in ranking_performance (iterativeRecommender.py:115-131)
    — without per-user host loops."""
    ids, _ = ranker.topk_device(score_fn, params)
    dev = device_ranking_metrics(
        ids,
        jnp.asarray(ranker.test_ids),
        jnp.asarray(ranker.test_counts),
        [top_n],
    )[top_n]
    return {k: float(v) for k, v in dev.items()}
