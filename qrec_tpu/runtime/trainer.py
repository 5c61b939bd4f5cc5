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
import numpy as np
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
    ``run_epoch(params, opt_state, batches, rng[, consts]) ->
    (params, opt_state, loss)`` where ``loss`` is the epoch total.

    Passing the optional trailing ``consts`` pytree of device arrays makes
    the runner call ``loss_fn(params, batch, rng, consts)``. Big model
    constants (graph adjacencies above all) must ride this path instead of
    being closed over: closure constants embed in the serialized HLO, and
    the axon remote-compile tunnel rejects programs past ~a few hundred MB
    of embedded constants (HTTP 413 — measured at yelp scale, PARITY.md).
    As a jit *argument* only the shape is serialized.

    ``donate=True`` donates the params/opt_state input buffers to XLA so the
    update happens in place — at production table scale (the embedding
    tables plus two Adam moments are the only large state) this halves the
    transient HBM footprint of every epoch. Callers must treat the inputs
    as CONSUMED: snapshot with ``jnp.copy`` before the next call (the
    training loop's best-params tracker does). ``consts`` is never donated.
    """

    def run_epoch(params, opt_state, batches, rng, consts=None):
        num_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
        rngs = jax.random.split(rng, num_batches)

        def step(carry, xs):
            params, opt_state = carry
            batch, step_rng = xs
            loss, grads = jax.value_and_grad(loss_fn)(
                params, batch, step_rng, *(() if consts is None else (consts,))
            )
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
    ``(params, opt_state, losses[E])``. The optional trailing ``consts``
    pytree reaches ``loss_fn(params, batch, rng, consts)`` as a jit
    argument (see make_epoch_runner)."""

    def run_chunk(params, opt_state, rng_pairs, consts=None):
        def epoch_body(carry, pair):
            params, opt_state = carry
            batches = sampler(pair[0])
            num_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
            step_rngs = jax.random.split(pair[1], num_batches)

            def step(c, xs):
                p, o = c
                batch, step_rng = xs
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, batch, step_rng, *(() if consts is None else (consts,))
                )
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
    sequence (see make_chunk_runner). The optional trailing ``consts``
    pytree reaches both ``loss_fn(params, batch, rng, consts)`` and
    ``eval_metrics_fn(params, consts)`` as a jit argument (see
    make_epoch_runner).
    """

    def run(params, opt_state, rng_pairs, epoch_ids, best_params, best_vec,
            best_epoch, consts=None):
        def epoch_body(carry, xs):
            params, opt_state, best_params, best_vec, best_epoch = carry
            pair, eid = xs
            batches = sampler(pair[0])
            num_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
            step_rngs = jax.random.split(pair[1], num_batches)

            def step(c, sx):
                p, o = c
                batch, step_rng = sx
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, batch, step_rng, *(() if consts is None else (consts,))
                )
                updates, o = optimizer.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), (batches, step_rngs)
            )
            vec = eval_metrics_fn(
                params, *(() if consts is None else (consts,))
            )
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


def _set_lr(opt_state, lr: float):
    """Mutate the injected learning rate of an inject_hyperparams state."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)


def buffers_deleted(tree) -> bool:
    """True if any ``jax.Array`` leaf in ``tree`` has been deleted.

    With ``donate=True`` an execution-phase failure (e.g. a tunnel timeout
    mid-chunk) consumes the donated inputs; resuming the loop with them
    would crash with a confusing 'donated buffer' error instead of the
    original failure. Fallback handlers re-raise when this is true."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and leaf.is_deleted():
            return True
    return False


class LoopState:
    """Explicit, committed-only state of the training dispatch loop.

    INVARIANT: ``rng`` is the per-epoch RNG stream position after exactly
    ``epoch`` completed epochs (one ``jax.random.split(rng, 3)`` per epoch),
    and ``params``/``opt_state`` are the values at that same boundary.
    Strategies mutate the state ONLY after a host materialization proves the
    dispatch executed, so when a chunked strategy fails mid-run the state
    still describes the last completed boundary and the per-epoch loop
    resumes bit-identically.
    """

    __slots__ = ("epoch", "rng", "params", "opt_state")

    def __init__(self, epoch, rng, params, opt_state):
        self.epoch = epoch
        self.rng = rng
        self.params = params
        self.opt_state = opt_state

    def commit(self, epoch, rng, params, opt_state):
        self.epoch = epoch
        self.rng = rng
        self.params = params
        self.opt_state = opt_state


def _derive_chunk_rngs(rng, e: int):
    """Advance the per-epoch stream by ``e`` epochs, returning the new
    position and the (E, 2, 2) stacked (sampler_rng, step_rng) pairs — the
    IDENTICAL split sequence the per-epoch loop uses, so chunked runs are
    bit-identical."""
    pairs = []
    for _ in range(e):
        rng, rng_samp, rng_step = jax.random.split(rng, 3)
        pairs.append(jnp.stack([rng_samp, rng_step]))
    return rng, jnp.stack(pairs)


class ChunkedLoop:
    """Chunked multi-epoch dispatch (``make_chunk_runner``): bit-identical
    losses/params to the per-epoch loop, one host sync per chunk."""

    def __init__(self, runner, chunk: int, *, timer, emit, lrate,
                 consts=None):
        self.runner = runner
        self.chunk = chunk
        self.timer = timer
        self.emit = emit
        self.lrate = lrate
        self.consts = consts

    def run(self, st: LoopState, max_epoch: int) -> None:
        while st.epoch < max_epoch:
            e = min(self.chunk, max_epoch - st.epoch)
            rng, pairs = _derive_chunk_rngs(st.rng, e)
            with self.timer:
                params, opt_state, losses = self.runner(
                    st.params, st.opt_state, pairs,
                    *(() if self.consts is None else (self.consts,)),
                )
                losses = np.asarray(losses)  # host sync: the chunk executed
            base = st.epoch
            st.commit(base + e, rng, params, opt_state)
            wall = self.timer.last / e
            for k in range(e):
                loss_val = float(losses[k])
                check_finite(loss_val)
                self.emit(base + k, loss_val, self.lrate, wall)


class ChunkedEvalLoop:
    """Chunked dispatch with device-resident quick eval and majority-vote
    best tracking (``make_chunk_eval_runner``).

    Device-side best state is seeded from the (possibly multi-phase shared)
    ``BestTracker`` and written back with :meth:`write_back` — callers run
    it on success AND on fallback after a partial run, so the vote continues
    seamlessly in the per-epoch loop."""

    def __init__(self, runner, chunk: int, tracker, params_template, *,
                 timer, emit, lrate, consts=None):
        self.runner = runner
        self.chunk = chunk
        self.tracker = tracker
        self.timer = timer
        self.emit = emit
        self.lrate = lrate
        self.consts = consts
        self._committed = False
        if tracker.best_metrics is not None and tracker.best_params is not None:
            self.best_vec = jnp.asarray(
                [tracker.best_metrics[k] for k in METRIC_KEYS],
                dtype=jnp.float32,
            )
            self.best_params = tracker.best_params
            self.best_epoch = jnp.asarray(tracker.best_epoch, dtype=jnp.int32)
        else:
            self.best_vec = jnp.full(
                (len(METRIC_KEYS),), -jnp.inf, dtype=jnp.float32
            )
            self.best_params = jax.tree_util.tree_map(jnp.copy, params_template)
            self.best_epoch = jnp.asarray(0, dtype=jnp.int32)

    def run(self, st: LoopState, max_epoch: int) -> None:
        while st.epoch < max_epoch:
            e = min(self.chunk, max_epoch - st.epoch)
            rng, pairs = _derive_chunk_rngs(st.rng, e)
            eids = jnp.arange(
                st.epoch + self.tracker.epoch_offset,
                st.epoch + self.tracker.epoch_offset + e,
                dtype=jnp.int32,
            )
            with self.timer:
                (
                    params, opt_state, losses, metrics,
                    best_params, best_vec, best_epoch,
                ) = self.runner(
                    st.params, st.opt_state, pairs, eids,
                    self.best_params, self.best_vec, self.best_epoch,
                    *(() if self.consts is None else (self.consts,)),
                )
                losses = np.asarray(losses)  # host sync: the chunk executed
            base = st.epoch
            st.commit(base + e, rng, params, opt_state)
            self.best_params = best_params
            self.best_vec = best_vec
            self.best_epoch = best_epoch
            self._committed = True
            metrics = np.asarray(metrics)
            wall = self.timer.last / e
            for k in range(e):
                loss_val = float(losses[k])
                check_finite(loss_val)
                self.emit(
                    base + k, loss_val, self.lrate, wall,
                    metrics=dict(zip(METRIC_KEYS, (float(v) for v in metrics[k]))),
                    eval_fused=True,
                )

    def write_back(self) -> None:
        """Write the device-side vote result onto the tracker (no-op unless
        at least one chunk committed)."""
        if not self._committed:
            return
        vec = np.asarray(self.best_vec)
        if np.all(np.isfinite(vec)):
            self.tracker.best_metrics = {
                k: float(v) for k, v in zip(METRIC_KEYS, vec)
            }
            self.tracker.best_epoch = int(self.best_epoch)
            self.tracker.best_params = self.best_params


class EpochLoop:
    """Per-epoch host loop — the always-available strategy. Bold-driver LR
    adaptation, the convergence rule, per-epoch rating display, quick-eval
    best tracking, checkpointing, and lag-1 loss pipelining all live here
    (base/iterativeRecommender.py:56-102, 115-185).

    ``quick_eval(params) -> metric dict`` feeds ``tracker.update``;
    ``checkpoint(epoch, st)`` is invoked after the LR/convergence update so
    a restored run resumes bit-identically; ``place(batches)`` shards epoch
    tensors onto an active mesh.
    """

    def __init__(self, run_epoch, sampler, *, timer, emit, lrate,
                 consts=None, place=None, bold=None, conv=None,
                 tracker=None, quick_eval=None, checkpoint=None,
                 pipelined=False):
        self.run_epoch = run_epoch
        self.sampler = sampler
        self.timer = timer
        self.emit = emit
        self.lrate = lrate
        self.consts = consts
        self.place = place
        self.bold = bold
        self.conv = conv
        self.tracker = tracker
        self.quick_eval = quick_eval
        self.checkpoint = checkpoint
        self.pipelined = pipelined

    def run(self, st: LoopState, max_epoch: int) -> None:
        # Lag-1 loss materialization (pipelined=True): epoch e's loss is
        # fetched AFTER dispatching epoch e+1, overlapping the device→host
        # round-trip (~25 ms over the axon tunnel) with compute. Loss lines
        # are identical, emitted one iteration later.
        pending = None  # (epoch_idx, device_loss, lr_at_epoch)
        for epoch in range(st.epoch, max_epoch):
            with self.timer:
                rng, rng_samp, rng_step = jax.random.split(st.rng, 3)
                batches = self.sampler(rng_samp)
                if self.place is not None:
                    batches = self.place(batches)
                params, opt_state, loss = self.run_epoch(
                    st.params, st.opt_state, batches, rng_step,
                    *(() if self.consts is None else (self.consts,)),
                )
                st.commit(epoch + 1, rng, params, opt_state)
                if self.pipelined:
                    if pending is not None:
                        # timer.last is still the previous (completed)
                        # epoch's interval — exactly the epoch whose loss
                        # prints here
                        p_epoch, p_loss, p_lr = pending
                        p_loss = float(p_loss)
                        check_finite(p_loss)
                        self.emit(p_epoch, p_loss, p_lr, self.timer.last)
                    pending = (
                        epoch, loss, self.bold.lr if self.bold else self.lrate
                    )
                    loss_val = None
                else:
                    loss_val = float(loss)
                    if self.conv is None:
                        # adam-mode NaN abort (iterativeRecommender.py:84-87);
                        # bold mode checks inside conv.check below
                        check_finite(loss_val)
            lr = self.bold.lr if self.bold else self.lrate
            metrics = None
            if self.quick_eval is not None and self.tracker is not None:
                metrics = self.quick_eval(st.params)
            if not self.pipelined:
                self.emit(epoch, loss_val, lr, self.timer.last,
                          params=st.params, metrics=metrics)
            if metrics is not None:
                if self.tracker.update(
                    epoch + self.tracker.epoch_offset, metrics
                ):
                    # deep-copy: the live params buffers are DONATED to the
                    # next epoch's jitted call on TPU (in-place update), so
                    # the snapshot must own its storage. Stored on the
                    # tracker so a shared tracker spans multi-phase fits.
                    self.tracker.best_params = jax.tree_util.tree_map(
                        jnp.copy, st.params
                    )
            if self.conv is not None:
                if self.conv.check(loss_val):
                    break
                new_lr = self.bold.update(epoch + 1, loss_val)
                self.bold.last_loss = loss_val
                st.opt_state = _set_lr(st.opt_state, new_lr)
            if self.checkpoint is not None:
                # save AFTER the LR/convergence update so a restored run
                # picks up exactly where the uninterrupted one would have
                self.checkpoint(epoch, st)
        if pending is not None:
            p_epoch, p_loss, p_lr = pending
            p_loss = float(p_loss)
            check_finite(p_loss)
            self.emit(p_epoch, p_loss, p_lr, self.timer.last)


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
