"""Model base hierarchy — the functional analogue of the reference's
template-method classes (base/recommender.py, base/iterativeRecommender.py,
base/deepRecommender.py, base/graphRecommender.py, base/socialRecommender.py).

A model implements:

* ``fit()`` — trains and leaves final factors on device (``self.U/self.V``
  for embedding models, or a custom scorer);
* ``score_fn_params()`` — (score_fn, params) for the tiled full-catalog
  ranker (:class:`qrec_tpu.ops.topk.CatalogRanker`);
* ``predict_ratings(users, items)`` — vectorized rating prediction with the
  reference's mean fallbacks (iterativeRecommender.py:65-73).

Training runs through one shared jitted loop (runtime/trainer.py) — models
supply a loss function, an optimizer, and an epoch sampler.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import ModelConf, OptionConf
from ..data.dataset import Interactions
from ..errors import ConvergenceError
from ..data.social import SocialGraph
from ..ops import sampling
from ..ops.topk import CatalogRanker, embedding_score_fn
from ..runtime import trainer as T

DEFAULT_SEED = 2026


class Recommender:
    """Root template (reference base/recommender.py:14-94)."""

    requires_social = False
    # full-catalog scoring batch; models with expensive per-pair towers
    # (e.g. NeuMF) lower this to bound the (batch × items × hidden) block
    eval_batch_size = 1024

    def __init__(
        self,
        conf: ModelConf,
        data: Interactions,
        social: Optional[SocialGraph] = None,
        fold: str = "[1]",
    ):
        self.config = conf
        self.data = data
        self.social = social
        self.fold = fold
        self.model_name = conf["model.name"]
        self.eval_settings = conf.options("evaluation.setup")
        self.ranking = conf.options("item.ranking")
        self.num_users, self.num_items, self.train_size = data.trainingSize()
        self.seed = conf.get_int("seed", DEFAULT_SEED)
        self.U: Optional[jnp.ndarray] = None
        self.V: Optional[jnp.ndarray] = None
        self.read_configuration()

    # -- config hooks -----------------------------------------------------
    def read_configuration(self) -> None:
        pass

    def model_args(self) -> Optional[OptionConf]:
        return self.config.model_options()

    def print_config(self) -> None:
        """Model banner (base/recommender.py:44-61)."""
        import os

        print("Model:", self.model_name)
        if self.config.contains("ratings"):
            print("Ratings dataset:", os.path.abspath(self.config["ratings"]))
        if self.eval_settings.contains("-testSet"):
            print("Test set:", os.path.abspath(self.eval_settings["-testSet"]))
        print(
            "Training set size: (user count: %d, item count %d, record count: %d)"
            % self.data.trainingSize()
        )
        print(
            "Test set size: (user count: %d, item count %d, record count: %d)"
            % self.data.testSize()
        )
        print("=" * 80)
        args = self.model_args()
        if args is not None:
            par = "  ".join(f"{k[1:]}:{args[k]}" for k in args.keys())
            print("Specific parameters:", par)
            print("=" * 80)

    # -- lifecycle --------------------------------------------------------
    def fit(self) -> None:
        pass

    # -- scoring ----------------------------------------------------------
    def score_fn_params(self) -> Tuple[Callable, dict]:
        """(score_fn, params) producing per-user full-catalog score blocks."""
        if self.U is None or self.V is None:
            raise RuntimeError(f"{self.model_name}: fit() before scoring")
        return embedding_score_fn, {"user_emb": self.U, "item_emb": self.V}

    def _ids(self, users, items):
        uids = np.array([self.data.user.get(u, -1) for u in users], dtype=np.int32)
        iids = np.array([self.data.item.get(i, -1) for i in items], dtype=np.int32)
        return uids, iids

    def _mean_fallback(self, uids: np.ndarray, iids: np.ndarray, dot: np.ndarray):
        """Reference fallback chain (iterativeRecommender.py:65-73)."""
        user_means = self.data.user_means[np.maximum(uids, 0)]
        item_means = self.data.item_means[np.maximum(iids, 0)]
        out = np.where(
            (uids >= 0) & (iids >= 0),
            dot,
            np.where(
                uids >= 0,
                user_means,
                np.where(iids >= 0, item_means, self.data.global_mean),
            ),
        )
        return out.astype(np.float64)

    def predict_ratings(self, users, items) -> np.ndarray:
        uids, iids = self._ids(users, items)
        if self.U is not None and self.V is not None:
            u_emb = np.asarray(self.U)[np.maximum(uids, 0)]
            v_emb = np.asarray(self.V)[np.maximum(iids, 0)]
            dot = np.sum(u_emb * v_emb, axis=1)
        else:
            dot = np.zeros(len(uids))
        return self._mean_fallback(uids, iids, dot)

    # -- persistence hooks (reference: base/recommender.py:74-78; driven
    # from config via ``model.setup=-save/-load <path>``, runtime/session.py)
    def _extra_state(self) -> dict:
        """Extra arrays beyond U/V a subclass needs for scoring (override)."""
        return {}

    def _set_extra_state(self, state: dict) -> None:
        pass

    def save_model(self, path: str) -> None:
        if self.U is None or self.V is None:
            raise RuntimeError(
                f"{self.model_name}: nothing to save — fit() or load first"
            )
        import os

        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        np.savez(
            path,
            U=np.asarray(self.U),
            V=np.asarray(self.V),
            **{k: np.asarray(v) for k, v in self._extra_state().items()},
        )

    def load_model(self, path: str) -> None:
        if not path.endswith(".npz"):
            path = path + ".npz"  # np.savez appends it on save
        z = np.load(path)
        self.U, self.V = jnp.asarray(z["U"]), jnp.asarray(z["V"])
        self._set_extra_state(
            {k: jnp.asarray(z[k]) for k in z.files if k not in ("U", "V")}
        )


class TrainSpec:
    """Uniform description of a single-phase training problem.

    Models that fit the standard shape implement ``build() -> TrainSpec`` and
    inherit the generic ``fit()``; multi-stage models (GANs, adversarial or
    warm-up schedules) override ``fit()`` directly.
    """

    def __init__(
        self,
        params,
        loss_fn: Callable,
        sampler: Callable,
        mode: str = "adam",
        track_best: bool = True,
        score_params_fn: Optional[Callable] = None,
        consts=None,
    ):
        self.params = params
        self.loss_fn = loss_fn
        self.sampler = sampler
        self.mode = mode
        self.track_best = track_best
        self.score_params_fn = score_params_fn
        # pytree of big device arrays threaded through every jitted dispatch
        # as an ARGUMENT (not a closure constant — the axon tunnel 413s
        # programs with large embedded constants). When set, ``loss_fn`` and
        # ``score_params_fn`` take it as a trailing argument.
        self.consts = consts


class IterativeRecommender(Recommender):
    """Adds embedding config, shared jitted training loop, bold-driver LR,
    convergence, and best-epoch tracking (base/iterativeRecommender.py)."""

    def read_configuration(self) -> None:
        super().read_configuration()
        self.emb_size = self.config.get_int("num.factors")
        self.max_epoch = self.config.get_int("num.max.epoch")
        lr_conf = self.config.options("learnRate")
        self.lrate = lr_conf.get_float("-init")
        self.max_lrate = lr_conf.get_float("-max")
        reg = self.config.options("reg.lambda")
        self.reg_u = reg.get_float("-u")
        self.reg_i = reg.get_float("-i")
        self.reg_b = reg.get_float("-b", 0.0)
        self.batch_size = self.config.get_int("batch_size", 2000)

    # -- init -------------------------------------------------------------
    def init_embeddings(self, kind: str = "uniform", extra: int = 0):
        """'uniform': P,Q ~ U(0,1)/3 (iterativeRecommender.py:36-39);
        'normal': truncated normal σ=0.005 (deepRecommender.py:21-22)."""
        rng = jax.random.PRNGKey(self.seed)
        ru, ri = jax.random.split(rng)
        shape_u = (self.num_users + extra, self.emb_size)
        shape_i = (self.num_items + extra, self.emb_size)
        if kind == "uniform":
            user = jax.random.uniform(ru, shape_u) / 3
            item = jax.random.uniform(ri, shape_i) / 3
        elif kind == "normal":
            user = jax.random.truncated_normal(ru, -2.0, 2.0, shape_u) * 0.005
            item = jax.random.truncated_normal(ri, -2.0, 2.0, shape_i) * 0.005
        else:
            raise ValueError(kind)
        return {"user_emb": user.astype(jnp.float32), "item_emb": item.astype(jnp.float32)}

    # -- device-resident training arrays ----------------------------------
    @property
    def train_arrays(self):
        if not hasattr(self, "_train_arrays"):
            d = self.data
            self._train_arrays = {
                "u": jnp.asarray(d.train_u),
                "i": jnp.asarray(d.train_i),
                "r": jnp.asarray(d.train_r),
                "indices": jnp.asarray(d.u_indices),
                "indptr": jnp.asarray(d.u_indptr),
            }
        return self._train_arrays

    @property
    def rated_bitmask(self):
        """Packed rated-items bitmask for O(1) membership probes."""
        if not hasattr(self, "_rated_bitmask"):
            self._rated_bitmask = jnp.asarray(
                sampling.pack_bitmask(
                    self.data.u_indptr,
                    self.data.u_indices,
                    self.num_users,
                    self.num_items,
                )
            )
        return self._rated_bitmask

    def _auto_tries(self) -> int:
        """Smallest rejection-round count whose EXPECTED whole-epoch failure
        count stays below 1e-2 — then the exact-fallback lax.cond branch
        (which re-derives every negative by bisection when ANY round fails)
        essentially never executes. Measured on TPU (lastfm, LightGCN
        epoch): 8 rounds 21.3 ms, 4 rounds 18.3 ms, 2 rounds 40.9 ms (the
        fallback fires) — the per-sample failure probability is
        (deg_u/num_items)^t, so the optimum depends on the dataset's
        density, computed exactly here."""
        if not self.train_size:
            return 4
        deg = np.diff(self.data.u_indptr).astype(np.float64)
        ratio = deg / max(self.num_items, 1)
        for t in (4, 6, 8, 12):
            if float(np.sum(deg * ratio**t)) < 1e-2:
                return t
        return 16

    def pairwise_sampler(self, num_tries: Optional[int] = None,
                         shuffle: bool = True) -> Callable:
        """rng -> (users, pos, neg, weight) batched epoch tensors."""
        if num_tries is None:
            num_tries = self._auto_tries()
        ta = self.train_arrays
        row_iters = sampling._bisect_iters(
            int(np.max(np.diff(self.data.u_indptr))) if self.train_size else 1
        )
        bitmask = self.rated_bitmask

        def sampler(rng):
            return sampling.pairwise_epoch(
                rng,
                ta["u"],
                ta["i"],
                ta["indices"],
                ta["indptr"],
                num_items=self.num_items,
                batch_size=self.batch_size,
                num_tries=num_tries,
                row_iters=row_iters,
                bitmask=bitmask,
                shuffle=shuffle,
            )

        return sampler

    def pointwise_sampler(self, num_negatives: int = 4,
                          num_tries: Optional[int] = None) -> Callable:
        if num_tries is None:
            num_tries = self._auto_tries()
        ta = self.train_arrays
        row_iters = sampling._bisect_iters(
            int(np.max(np.diff(self.data.u_indptr))) if self.train_size else 1
        )
        bitmask = self.rated_bitmask

        def sampler(rng):
            return sampling.pointwise_epoch(
                rng,
                ta["u"],
                ta["i"],
                ta["indices"],
                ta["indptr"],
                num_items=self.num_items,
                batch_size=self.batch_size,
                num_negatives=num_negatives,
                num_tries=num_tries,
                row_iters=row_iters,
                bitmask=bitmask,
            )

        return sampler

    def rating_sampler(self) -> Callable:
        """rng -> shuffled (users, items, ratings, weight) epoch batches for
        explicit-rating SGD models."""
        ta = self.train_arrays
        n = self.train_size
        bs = self.batch_size
        num_batches = (n + bs - 1) // bs
        padded = num_batches * bs

        @jax.jit
        def sampler(rng):
            perm = jax.random.permutation(rng, n)
            pad = jnp.concatenate([perm, jnp.zeros(padded - n, dtype=perm.dtype)])
            w = (jnp.arange(padded) < n).astype(jnp.float32)
            shape = (num_batches, bs)
            return (
                ta["u"][pad].reshape(shape),
                ta["i"][pad].reshape(shape),
                ta["r"][pad].reshape(shape),
                w.reshape(shape),
            )

        return sampler

    # -- multi-chip placement ---------------------------------------------
    @property
    def mesh(self):
        """('data','model') mesh when multi-chip parallelism is enabled.

        Opt-in via ``parallel.setup=on [-model K]`` or automatic when more
        than one device is visible. Embedding tables are row-sharded over
        'model'; epoch batch tensors are sharded over 'data'; XLA GSPMD
        inserts the collectives (numerics verified identical to
        single-device in tests/test_parallel.py).
        """
        if not hasattr(self, "_mesh"):
            import jax

            self._mesh = None
            setup = self.config.get("parallel.setup")
            n_dev = len(jax.devices())
            enabled = False
            model_par = None
            if setup is not None:
                opts = OptionConf(setup)
                enabled = opts.isMainOn()
                model_par = opts.get_int("-model", 0) or None
            elif n_dev > 1 and jax.default_backend() == "tpu":
                enabled = True
            if enabled and n_dev > 1:
                from ..parallel.mesh import (
                    make_mesh,
                    maybe_initialize_distributed,
                    shardings,
                )

                maybe_initialize_distributed(self.config)
                self._mesh = make_mesh(model_parallel=model_par)
                self._shardings = shardings(self._mesh)
        return self._mesh

    def _place(self, params, batches=None):
        """device_put params (embedding rows over 'model') and batches
        (leading batch dim over 'data') onto the mesh, if one is active."""
        if self.mesh is None:
            return params, batches
        import jax

        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = self._shardings
        params = sh.params(params) if isinstance(params, dict) else params
        if batches is not None:
            # epoch tensors are (num_batches, batch, ...): shard the batch dim
            batch_sh = NamedSharding(self._mesh, P(None, "data"))
            batches = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, batch_sh)
                if x.ndim >= 2
                else jax.device_put(x, sh.replicated),
                batches,
            )
        return params, batches

    # -- quick eval -------------------------------------------------------
    def _quick_ranker(self) -> Optional[CatalogRanker]:
        if not self.ranking.isMainOn() or len(self.data.test_set_u) == 0:
            return None
        if not hasattr(self, "_ranker"):
            top = self.ranking.get_ints("-topN")
            n = max(top)
            if n > 100 or n < 1:
                n = 10
            self._top_n = n
            self._ranker = CatalogRanker(
                self.data, k=n, batch_size=self.eval_batch_size, mesh=self.mesh
            )
        return self._ranker

    def dense_ratings(self) -> jnp.ndarray:
        """Device-resident dense |U|×|I| rating matrix (for row/col-input
        models: DMF/CDAE/CFGAN). Cached."""
        if not hasattr(self, "_dense_r"):
            self._dense_r = jnp.asarray(self.data.dense_matrix())
        return self._dense_r

    # -- generic lifecycle for single-phase models ------------------------
    def build(self) -> "TrainSpec":
        raise NotImplementedError

    def finalize(self, params, spec: "TrainSpec") -> None:
        """Map trained params onto the model's prediction attributes.

        CONTRACT: must be idempotent, cheap, and a pure function of
        ``params`` — rating-mode training calls it once per epoch to display
        MAE/RMSE (``_quick_rating_metrics``), then once more with the final
        params. A subclass whose finalize is expensive or stateful must
        override ``_quick_rating_metrics`` to avoid the per-epoch call.
        """
        if spec.score_params_fn is not None:
            final = spec.score_params_fn(
                params, *(() if spec.consts is None else (spec.consts,))
            )
        else:
            final = {
                "user_emb": params["user_emb"],
                "item_emb": params["item_emb"],
            }
        self.U = final["user_emb"]
        self.V = final["item_emb"]
        self.final_params = params

    def fit(self) -> None:
        spec = self.build()
        rating_eval = None
        if not self.ranking.isMainOn() and len(self.data.test_data) > 0:
            rating_eval = lambda p: self._quick_rating_metrics(p, spec)  # noqa: E731
        params = self.run_training(
            spec.params,
            spec.loss_fn,
            spec.sampler,
            mode=spec.mode,
            track_best=spec.track_best,
            score_params_fn=spec.score_params_fn,
            rating_eval=rating_eval,
            consts=spec.consts,
        )
        self.finalize(params, spec)

    def _quick_rating_metrics(self, params, spec: "TrainSpec"):
        """Per-epoch MAE/RMSE display for rating models — the reference
        prints these alongside the loss each epoch
        (base/iterativeRecommender.py:91-94). Maps in-flight params onto the
        model's predict attributes via ``finalize`` (overwritten again at the
        end of training), then scores the test records."""
        if not hasattr(self, "_quick_rating_data"):
            self._quick_rating_data = (
                [e[0] for e in self.data.test_data],
                [e[1] for e in self.data.test_data],
                np.asarray([float(e[2]) for e in self.data.test_data]),
            )
        users, items, truth = self._quick_rating_data
        self.finalize(params, spec)
        preds = np.asarray(self.predict_ratings(users, items), dtype=np.float64)
        lo, hi = self.data.r_scale[0], self.data.r_scale[-1]
        preds = np.clip(preds, lo, hi)
        err = preds - truth
        mae = float(np.mean(np.abs(err)))
        rmse = float(np.sqrt(np.mean(err**2)))
        return {"MAE": mae, "RMSE": rmse}

    # -- the shared loop --------------------------------------------------
    def _make_optimizer(self, mode: str):
        if mode == "adam":
            return optax.adam(self.lrate)
        if mode == "bold":
            return optax.inject_hyperparams(optax.sgd)(learning_rate=self.lrate)
        raise ValueError(mode)

    def _restore_checkpoint(self, params, opt_state, bold, conv, max_epoch):
        """Checkpoint/resume (runtime/checkpoint.py; SURVEY §5): returns
        (checkpointer, start_epoch, params, opt_state) with host-side LR
        schedule scalars restored so a resumed run is bit-identical."""
        from ..runtime import checkpoint as C

        if not hasattr(self, "_epochs_done"):
            self._epochs_done = 0  # cumulative across multi-phase fits
        if not hasattr(self, "_checkpointer"):
            self._checkpointer = C.from_config(self.config)
            self._ckpt_every = C.checkpoint_every(self.config)
        ckpt = self._checkpointer
        start_epoch = 0
        if ckpt is not None:
            latest = ckpt.latest_step()
            if latest is not None and latest > self._epochs_done:
                start_epoch = min(latest - self._epochs_done, max_epoch)
                state = ckpt.restore(
                    latest,
                    template={
                        "params": params,
                        "opt_state": opt_state,
                        # host-side LR schedule scalars: float64 numpy so the
                        # bold-driver's double-precision host arithmetic
                        # resumes bit-identically
                        "lr": np.zeros((), np.float64),
                        "bold_last": np.zeros((), np.float64),
                        "conv_last": np.zeros((), np.float64),
                    },
                )
                params = state["params"]
                opt_state = state["opt_state"]
                if bold is not None:
                    bold.lr = float(state["lr"])
                    bold.last_loss = float(state["bold_last"])
                    conv.last_loss = float(state["conv_last"])
                    opt_state = T._set_lr(opt_state, bold.lr)
                print(
                    f"{self.model_name} {self.fold} resumed from checkpoint "
                    f"step {latest} (epoch {start_epoch}/{max_epoch})"
                )
        return ckpt, start_epoch, params, opt_state

    def _make_emit(self, max_epoch, log_every, rating_eval):
        """Epoch-line printer (iterativeRecommender.py:88-94): loss + LR +
        optional rating/ranking metrics + wall clock."""

        def _emit(epoch_i, loss_v, lr_v, wall, params=None, metrics=None,
                  eval_fused=False):
            if (epoch_i + 1) % log_every != 0 and epoch_i != max_epoch - 1:
                return
            extra = ""
            if rating_eval is not None and params is not None:
                rm = rating_eval(params)
                extra = " " + " ".join(f"{k}:{v:.5f}" for k, v in rm.items())
            if metrics is not None:
                extra += " " + " ".join(
                    f"{k}:{v:.5f}" for k, v in metrics.items()
                )
            eps = self.train_size / wall if wall > 0 else 0.0
            # the fused-eval runner cannot separate train from eval time
            # device-side, so its per-epoch wall includes the quick eval
            note = " incl. eval" if eval_fused else ""
            print(
                f"{self.model_name} {self.fold} epoch {epoch_i + 1}: "
                f"loss = {loss_v:.4f} learning_rate = {lr_v:.5f}{extra} "
                f"[{wall * 1e3:.1f} ms{note}, {eps:,.0f} ex/s]"
            )

        return _emit

    def _make_checkpoint_cb(self, ckpt, bold, conv):
        if ckpt is None:
            return None

        def checkpoint_cb(epoch, st):
            if self._ckpt_every > 0 and (epoch + 1) % self._ckpt_every == 0:
                ckpt.save(
                    self._epochs_done + epoch + 1,
                    {
                        "params": st.params,
                        "opt_state": st.opt_state,
                        "lr": np.asarray(
                            bold.lr if bold else self.lrate, dtype=np.float64
                        ),
                        "bold_last": np.asarray(
                            bold.last_loss if bold else 0.0, dtype=np.float64
                        ),
                        "conv_last": np.asarray(
                            conv.last_loss if conv else 0.0, dtype=np.float64
                        ),
                    },
                )

        return checkpoint_cb

    def _run_chunked_strategies(self, st, max_epoch, *, chunk, pipelined,
                                eval_chunkable, loss_fn, optimizer, sampler,
                                sp_fn, tracker, ranker, timer, emit, consts,
                                donate):
        """Run the applicable chunked strategy (fused-eval or plain),
        advancing ``st`` in place; on a recoverable failure the state stays
        at the last completed chunk boundary for the per-epoch loop."""

        def _fallback(exc, what):
            # Chunks that COMPLETED already advanced the state — the per-epoch
            # loop resumes from the last committed boundary bit-identically.
            # But if the failure happened at EXECUTION time, the failed call
            # consumed the donated params/opt_state buffers; resuming would
            # crash confusingly, so surface the original error instead.
            if T.buffers_deleted(st.params) or T.buffers_deleted(st.opt_state):
                raise exc
            print(
                f"{self.model_name} {self.fold} {what} "
                f"unavailable ({type(exc).__name__}); using per-epoch loop"
            )

        if chunk > 1 and eval_chunkable and max_epoch - st.epoch > 1:
            def _eval_vec(p, *c):
                return T.quick_eval_vector(
                    ranker, embedding_score_fn, sp_fn(p, *c), self._top_n
                )

            ev = T.ChunkedEvalLoop(
                T.make_chunk_eval_runner(
                    loss_fn, optimizer, sampler, _eval_vec, donate=donate
                ),
                chunk, tracker, st.params,
                timer=timer, emit=emit, lrate=self.lrate, consts=consts,
            )
            try:
                ev.run(st, max_epoch)
            except ConvergenceError:
                raise
            except Exception as exc:
                _fallback(exc, "chunked eval dispatch")
            ev.write_back()
        elif chunk > 1 and pipelined and max_epoch - st.epoch > 1:
            try:
                T.ChunkedLoop(
                    T.make_chunk_runner(
                        loss_fn, optimizer, sampler, donate=donate
                    ),
                    chunk, timer=timer, emit=emit, lrate=self.lrate,
                    consts=consts,
                ).run(st, max_epoch)
            except ConvergenceError:
                raise
            except Exception as exc:
                _fallback(exc, "chunked dispatch")

    def run_training(
        self,
        params,
        loss_fn: Callable,
        sampler: Callable,
        *,
        mode: str = "adam",
        track_best: bool = True,
        score_params_fn: Optional[Callable] = None,
        max_epoch: Optional[int] = None,
        log_every: int = 1,
        tracker: Optional["T.BestTracker"] = None,
        return_best: bool = True,
        rating_eval: Optional[Callable] = None,
        consts=None,
    ):
        """Train ``params`` and return the (best) final params.

        ``mode='adam'``: fixed-LR Adam (the reference's TF paths); ``'bold'``:
        SGD + bold-driver LR + the ``|Δloss|<1e-3`` convergence rule (the
        NumPy-SGD family). ``score_params_fn(params)`` maps trainable params
        to catalog-scorer params for quick eval; ``rating_eval(params)``
        adds MAE/RMSE to the epoch line (iterativeRecommender.py:91-94).
        ``consts``: optional pytree of big device arrays threaded through
        every jitted dispatch as an ARGUMENT, not a closure constant (the
        axon tunnel 413s large embedded constants) — when set, ``loss_fn``
        and ``score_params_fn`` take it as a trailing argument. Checkpoint/
        resume (``checkpoint.setup=on -dir D -every N``) restores params +
        optimizer + LR schedule and fast-forwards the RNG stream so a
        resumed run is bit-identical. The loop itself is three dispatch
        strategies in runtime/trainer.py (ChunkedEvalLoop / ChunkedLoop /
        EpochLoop) sharing one explicit :class:`~T.LoopState`; a chunked
        strategy failing mid-run hands the state at its last completed
        chunk boundary to the per-epoch loop bit-identically.
        """
        max_epoch = max_epoch or self.max_epoch
        # ``evaluation.setup ... -tf`` selects the reference's TF path —
        # minibatch Adam at fixed LR — over the NumPy-SGD bold-driver loop
        # (base/recommender.py:194-201; e.g. BPR.py:77-96 trainModel_tf)
        if mode == "bold" and self.eval_settings.contains("-tf"):
            mode = "adam"
        optimizer = self._make_optimizer(mode)
        # donate params/opt_state on TPU: the tables + Adam moments are the
        # only large state, and in-place updates halve the epoch's transient
        # HBM footprint. The loop below never reuses a donated input — the
        # best-params snapshot copies.
        donate = jax.default_backend() == "tpu"
        run_epoch = T.make_epoch_runner(loss_fn, optimizer, donate=donate)
        opt_state = optimizer.init(params)

        bold = T.BoldDriver(self.lrate, self.max_lrate) if mode == "bold" else None
        conv = T.ConvergenceMonitor() if mode == "bold" else None
        if tracker is None and track_best:
            tracker = T.BestTracker()
        ranker = self._quick_ranker() if track_best else None

        params, _ = self._place(params)
        if self.mesh is not None:
            opt_state = optimizer.init(params)  # re-init on sharded params

        from ..runtime.profiling import StepTimer

        ckpt, start_epoch, params, opt_state = self._restore_checkpoint(
            params, opt_state, bold, conv, max_epoch
        )
        rng = jax.random.PRNGKey(self.seed + 1)
        # fast-forward the per-epoch RNG stream so a resumed run samples the
        # exact batches an uninterrupted run would have
        for _ in range(start_epoch):
            rng, _, _ = jax.random.split(rng, 3)

        timer = StepTimer(examples_per_epoch=self.train_size)
        self._last_timer = timer
        _emit = self._make_emit(max_epoch, log_every, rating_eval)

        # params → catalog-scorer params with the consts convention applied:
        # score_params_fn takes consts as a trailing arg iff consts is set
        if score_params_fn is None:
            sp_fn = lambda p, *c: {  # noqa: E731
                "user_emb": p["user_emb"], "item_emb": p["item_emb"]
            }
        else:
            sp_fn = score_params_fn
        cargs = () if consts is None else (consts,)

        def quick_eval(p):
            return T.quick_eval_metrics(
                ranker, embedding_score_fn, sp_fn(p, *cargs), self._top_n
            )

        checkpoint_cb = self._make_checkpoint_cb(ckpt, bold, conv)

        # Strategy selection. Lag-1 pipelining / chunked dispatch apply when
        # nothing on the host consumes per-epoch state (fixed-LR Adam, no
        # bold-driver/convergence/rating display); the fused-eval chunk
        # additionally requires that the ONLY per-epoch consumer is the
        # best-model tracker. See the strategy docstrings in runtime/trainer.
        pipelined = bold is None and rating_eval is None and ranker is None
        # fused-eval chunking: train epoch → encode → top-k → metrics →
        # majority-vote → best-params all inside one lax.scan — the host-loop
        # equivalent costs ~975 ms/epoch of tunnel syncs for a 21 ms training
        # epoch (measured, LightGCN/lastfm 120-epoch session)
        eval_chunkable = (
            bold is None
            and rating_eval is None
            and ranker is not None
            and tracker is not None
        )
        chunk = 1
        if (pipelined or eval_chunkable) and ckpt is None and self.mesh is None:
            raw = (
                self.config["train.chunk"]
                if self.config.contains("train.chunk")
                else "auto"
            ).strip()
            chunk = 8 if raw == "auto" else max(1, int(raw))

        st = T.LoopState(start_epoch, rng, params, opt_state)
        self._run_chunked_strategies(
            st, max_epoch, chunk=chunk, pipelined=pipelined,
            eval_chunkable=eval_chunkable, loss_fn=loss_fn,
            optimizer=optimizer, sampler=sampler, sp_fn=sp_fn,
            tracker=tracker, ranker=ranker, timer=timer, emit=_emit,
            consts=consts, donate=donate,
        )

        if st.epoch < max_epoch:
            T.EpochLoop(
                run_epoch, sampler,
                timer=timer, emit=_emit, lrate=self.lrate, consts=consts,
                place=(
                    (lambda b: self._place(None, b)[1])
                    if self.mesh is not None else None
                ),
                bold=bold, conv=conv, tracker=tracker,
                quick_eval=(
                    quick_eval
                    if tracker is not None and ranker is not None
                    else None
                ),
                checkpoint=checkpoint_cb,
                pipelined=pipelined,
            ).run(st, max_epoch)

        params = st.params
        if tracker is not None:
            # actual epochs executed (bold-mode convergence can break early);
            # max_epoch here would skew best_epoch for shared trackers
            tracker.epoch_offset += st.epoch
        if (
            return_best
            and tracker is not None
            and tracker.best_metrics is not None
            and tracker.best_params is not None
        ):
            print(
                f"{self.model_name} {self.fold} best epoch {tracker.best_epoch}: "
                + " | ".join(f"{k}:{v:.5f}" for k, v in tracker.best_metrics.items())
            )
            return tracker.best_params
        return params


def resolved_platform() -> str:
    """The platform jax actually resolved — honors a post-import
    ``jax.config.update('jax_platforms', ...)`` override, falling back to
    the JAX_PLATFORMS env var (the axon tunnel sets the latter; a CPU
    switch per CLAUDE.md sets only the former)."""
    import os

    return (
        getattr(jax.config, "jax_platforms", None)
        or os.environ.get("JAX_PLATFORMS", "")
        or ""
    )


class GraphRecommender(IterativeRecommender):
    """Adds the normalized joint adjacency on device
    (base/graphRecommender.py:10-39).

    Backend selection: graphs whose U×I fits the dense budget use the
    dense-bipartite MXU path (TPU random gather runs at ~2% of HBM
    bandwidth; two dense bf16 matmuls are ~25× faster at benchmark scale);
    larger graphs fall back to sorted-COO segment-sum. Override with the
    config key ``graph.backend=coo|dense|pallas`` (``pallas`` = the one-hot
    MXU scatter kernel in ops/pallas_kernels.weighted_segment_matmul).
    """

    # Models whose build() threads the joint adjacency through
    # TrainSpec.consts (jit argument, ops/spmm.split_consts) instead of
    # closing over it — for them dense tables never embed in the serialized
    # HLO, so the axon tunnel's constant-size cap does not apply.
    threads_adj_consts = False

    @property
    def joint_adj(self):
        if not hasattr(self, "_joint_adj"):
            import jax

            from ..data.graph import joint_normalized_adjacency
            from ..ops.spmm import (
                AXON_EMBED_LIMIT,
                DENSE_JOINT_LIMIT,
                DenseJoint,
                DeviceCOO,
                PaddedCOO,
                ShardedPaddedCOO,
            )

            backend = self.config.get("graph.backend", "auto")
            # Mesh policy: under an active mesh the one-hot MXU scatter
            # kernel runs as a ShardedPaddedCOO — edges pre-partitioned by
            # output-row shard, one kernel per device under shard_map, x
            # replicated via an XLA all-gather over ICI (ops/spmm.py). The
            # DenseJoint two-matmul and DeviceCOO paths partition natively
            # under GSPMD as before.
            on_mesh = self.mesh is not None
            # entry budget for the dense-bipartite path, overridable for
            # smaller HBM budgets (or to force the sparse path on big hosts)
            try:
                dense_limit = int(
                    self.config.get("graph.dense.limit", DENSE_JOINT_LIMIT)
                )
            except ValueError:
                from ..errors import ConfigError

                raise ConfigError(
                    "graph.dense.limit must be an integer entry budget, got "
                    f"{self.config.get('graph.dense.limit')!r}"
                ) from None
            dense_ok = self.num_users * self.num_items <= dense_limit
            # The axon remote-compile tunnel rejects serialized computations
            # past ~a few hundred MB (HTTP 413), and closure-captured dense
            # adjacencies embed in the HLO as constants — measured: a
            # yelp-scale 409M-entry table 413s even at int8, while lastfm's
            # 33M passes. Under the tunnel, auto therefore caps the dense
            # path at a conservative embed budget (the pallas edge kernel
            # takes over past it) — UNLESS the model threads the adjacency
            # through TrainSpec.consts (jit argument: only shapes are
            # serialized). An explicit graph.dense.limit or
            # graph.backend=dense still forces the attempt.
            if (
                backend == "auto"
                and not self.threads_adj_consts
                and not self.config.contains("graph.dense.limit")
                and resolved_platform() == "axon"
            ):
                dense_ok = dense_ok and (
                    self.num_users * self.num_items <= AXON_EMBED_LIMIT
                )
            on_tpu = jax.default_backend() == "tpu"
            if backend == "dense" or (backend == "auto" and dense_ok):
                # Single-pass dual-product kernel: halves the adjacency HBM
                # traffic that dominates every DenseJoint training step. Not
                # GSPMD-partitionable, so meshes stay on the two-matmul path;
                # graph.dense.dual=on forces it off-TPU (interpret mode, for
                # tests), =off pins the XLA path.
                dual_conf = self.config.get("graph.dense.dual", "auto")
                if dual_conf not in ("auto", "on", "off"):
                    from ..errors import ConfigError

                    raise ConfigError(
                        "graph.dense.dual must be auto|on|off, got "
                        f"{dual_conf!r}"
                    )
                if dual_conf == "on" and on_mesh:
                    print(
                        "graph.dense.dual=on is single-device only; using"
                        " the partitionable two-matmul path under the mesh"
                    )
                # Round-3 measurement (scripts/dual_bench.py, v5e, lastfm):
                # inside the scan-based epoch the XLA two-matmul path
                # streams the adjacency at ~570 GB/s (~70% of HBM peak), so
                # halving the reads with the dual kernel nets ZERO at its
                # measured ~290 GB/s effective rate (epoch 33.2 ms XLA vs
                # 33.9 ms dual). auto therefore resolves to the XLA path;
                # =on keeps the kernel available (gated on its pinned-VMEM
                # footprint estimate for skewed shapes).
                from ..ops.pallas_kernels import DUAL_VMEM_LIMIT, dual_vmem_bytes

                # widest x the model will push through spmm — SimGCL's
                # fused 3-view propagation concatenates views to (N, 3d)
                spmm_width = getattr(self, "spmm_width", self.emb_size)
                dual_fits_vmem = (
                    dual_vmem_bytes(
                        self.num_users, self.num_items, spmm_width
                    )
                    <= int(DUAL_VMEM_LIMIT * 0.9)
                )
                use_dual = not on_mesh and dual_conf == "on" and dual_fits_vmem
                if dual_conf == "on" and not dual_fits_vmem:
                    print(
                        "graph.dense.dual=on exceeds the kernel's VMEM "
                        "budget for this shape; using the two-matmul path"
                    )
                # int8 adjacency (graph.dense.quant=auto|off|int8|factored):
                # halves the HBM-dominant adjacency stream via the symmetric
                # custom VJP (ops/spmm._int8_joint_matmul). 'factored' is
                # EXACT — the normalized adjacency factors as
                # diag(deg_u^-1/2)·R·diag(deg_i^-1/2) with binary R stored
                # int8, so the only rounding is the bf16 activation cast,
                # the same class as the bf16 dense path — and is therefore
                # the DEFAULT on TPU (auto). 'int8' is the legacy lossy
                # per-row-scaled form (parity measured in PARITY.md); CPU
                # auto stays bf16 (no int8 matmul advantage there).
                quant_conf = self.config.get("graph.dense.quant", "auto")
                if quant_conf not in ("auto", "off", "int8", "factored"):
                    from ..errors import ConfigError

                    raise ConfigError(
                        "graph.dense.quant must be auto|off|int8|factored, "
                        f"got {quant_conf!r}"
                    )
                if quant_conf == "auto":
                    quant = "factored" if on_tpu else False
                else:
                    quant = False if quant_conf == "off" else quant_conf
                if quant and use_dual:
                    print(
                        f"graph.dense.quant={quant} supersedes the dual "
                        "kernel; using the int8 two-matmul path"
                    )
                    use_dual = False
                self._joint_adj = DenseJoint.from_interactions(
                    self.data,
                    dual=use_dual,
                    dual_interpret=not on_tpu,
                    quant=quant,
                )
            elif backend == "pallas" or (backend == "auto" and on_tpu):
                # Past the dense budget, the one-hot MXU scatter kernel beats
                # XLA's segment_sum ~17x on v5e — make it the TPU default.
                # One-hot MXU scatter kernel (ops/pallas_kernels.py). The
                # joint adjacency is symmetric, which both Padded layouts
                # require. Under a mesh, the row-shard-partitioned variant
                # keeps the kernel win instead of downgrading to XLA COO.
                if on_mesh:
                    self._joint_adj = ShardedPaddedCOO.from_host(
                        joint_normalized_adjacency(self.data),
                        self.mesh,
                        interpret=not on_tpu,
                    )
                else:
                    self._joint_adj = PaddedCOO.from_host(
                        joint_normalized_adjacency(self.data),
                        interpret=not on_tpu,
                        check_symmetric=False,
                    )
            elif backend in ("coo", "auto"):
                self._joint_adj = DeviceCOO.from_host(
                    joint_normalized_adjacency(self.data)
                )
            else:
                from ..errors import ConfigError

                raise ConfigError(
                    f"unknown graph.backend {backend!r} "
                    "(expected auto|dense|coo|pallas)"
                )
            print(
                f"Graph backend: {type(self._joint_adj).__name__}"
                f" (graph.backend={backend})"
            )
        return self._joint_adj

    @property
    def joint_adj_coo(self):
        """Always-COO joint adjacency (for per-edge masked values)."""
        if not hasattr(self, "_joint_adj_coo"):
            from ..data.graph import joint_normalized_adjacency
            from ..ops.spmm import DeviceCOO

            self._joint_adj_coo = DeviceCOO.from_host(
                joint_normalized_adjacency(self.data)
            )
        return self._joint_adj_coo


class SocialRecommender(IterativeRecommender):
    """Adds the cleaned trust graph and ``-s`` regularization
    (base/socialRecommender.py:43-46)."""

    requires_social = True

    def read_configuration(self) -> None:
        super().read_configuration()
        reg = self.config.options("reg.lambda")
        self.reg_s = reg.get_float("-s", 0.0)

    @property
    def social_arrays(self):
        if not hasattr(self, "_social_arrays"):
            src, dst, w = self.social.coo()
            self._social_arrays = {
                "src": jnp.asarray(src),
                "dst": jnp.asarray(dst),
                "w": jnp.asarray(w),
            }
        return self._social_arrays
