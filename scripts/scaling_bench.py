"""Scaling methodology harness: examples/s at mesh sizes 1/2/4/8.

On this build environment only one real TPU chip is reachable, so the
harness runs on virtual CPU devices to validate the *mechanics* (sharded
epoch runner, collectives, batch-dim sharding); the printed efficiencies are
meaningful only on real multi-chip hardware, where the same code path runs
unchanged (jax.distributed.initialize for multi-host).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# stay off the (single-chip) TPU unless explicitly requested — probing the
# backend would initialize it and pin the platform
if os.environ.get("QREC_SCALING_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import optax

from qrec_tpu import ModelConf
from qrec_tpu.data.dataset import Interactions
from qrec_tpu.models import get_model
from qrec_tpu.runtime.trainer import make_epoch_runner


def build(conf_overrides=None):
    rng = np.random.RandomState(0)
    train, test = [], []
    for u in range(2000):
        items = rng.choice(4000, size=24, replace=False)
        for i in items[:20]:
            train.append([f"u{u}", f"i{i}", 1.0])
        for i in items[20:]:
            test.append([f"u{u}", f"i{i}", 1.0])
    conf = ModelConf(
        {
            "ratings": "synthetic",
            "ratings.setup": "-columns 0 1 2",
            "model.name": "BPR",
            "evaluation.setup": "-ap 0.2",
            "item.ranking": "on -topN 10",
            "num.factors": "64",
            "num.max.epoch": "3",
            "batch_size": "4096",
            "learnRate": "-init 0.05 -max 1",
            "reg.lambda": "-u 0.01 -i 0.01 -b 0.1 -s 0.1",
            "output.setup": "off -dir ./results/",
            "seed": "1",
        }
    )
    if conf_overrides:
        conf.config.update(conf_overrides)
    return conf, Interactions(conf, train, test)


def measure(n_devices, model_name="BPR", graph_backend=None):
    over = (
        {"parallel.setup": f"on -model {2 if n_devices % 2 == 0 and n_devices > 1 else 1}"}
        if n_devices > 1
        else {}
    )
    if model_name == "LightGCN":
        over["model.name"] = "LightGCN"
        over["LightGCN"] = "-n_layer 2"
        # keep auto off the dense path so the SpMM backend under test runs
        over["graph.dense.limit"] = "1"
    if graph_backend:
        over["graph.backend"] = graph_backend
    conf, data = build(over)
    model = get_model(model_name)(conf, data)
    if n_devices > 1:
        from qrec_tpu.parallel.mesh import make_mesh, shardings

        model._mesh = make_mesh(n_devices)
        model._shardings = shardings(model._mesh)
    else:
        model._mesh = None
    spec = model.build()
    optimizer = optax.sgd(0.05)
    run_epoch = make_epoch_runner(spec.loss_fn, optimizer)
    cargs = () if spec.consts is None else (spec.consts,)
    params, _ = model._place(spec.params)
    opt_state = optimizer.init(params)
    rng = jax.random.PRNGKey(0)
    r1, r2 = jax.random.split(rng)
    batches = spec.sampler(r1)
    _, batches = model._place(None, batches)
    params, opt_state, loss = run_epoch(params, opt_state, batches, r2, *cargs)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for k in range(3):
        batches = spec.sampler(jax.random.fold_in(rng, k))
        _, batches = model._place(None, batches)
        params, opt_state, loss = run_epoch(params, opt_state, batches, r2, *cargs)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / 3
    return len(data.training_data) / dt


def main():
    n = len(jax.devices())
    backend = jax.default_backend()
    sizes = [s for s in (1, 2, 4, 8) if s <= n]
    base = None
    print(f"devices available: {n} ({backend})")
    real_hw = backend == "tpu"
    if not real_hw:
        print(
            "virtual-device run: validating sharding MECHANICS only — "
            "efficiency percentages are withheld (they are meaningless when "
            "N 'devices' share one host's cores; run with QREC_SCALING_TPU=1 "
            "on real multi-chip hardware for efficiencies)"
        )
    # three workloads: the shallow MF step (embedding + psum grads), and the
    # graph-propagation epoch through BOTH mesh SpMM backends — the XLA COO
    # segment-sum path and the row-shard-partitioned Pallas scatter
    # (ShardedPaddedCOO; interpret-mode kernel off-TPU, so off-TPU its
    # numbers validate mechanics, not speed)
    cases = [
        ("BPR/embedding", dict(model_name="BPR")),
        ("LightGCN/coo", dict(model_name="LightGCN", graph_backend="coo")),
        ("LightGCN/sharded-pallas", dict(model_name="LightGCN", graph_backend="pallas")),
    ]
    for label, kw in cases:
        base = None
        for s in sizes:
            if label.endswith("sharded-pallas") and s == 1 and not real_hw:
                # single-device pallas off-TPU = interpret-mode kernel; its
                # wall time says nothing — skip the degenerate point
                continue
            eps = measure(s, **kw)
            if base is None:
                base = (eps, s)
            if real_hw:
                eff = eps * base[1] / (base[0] * s) * 100
                print(
                    f"[{label}] mesh={s}: {eps:,.0f} ex/s  "
                    f"scaling efficiency {eff:.0f}%",
                    flush=True,
                )
            else:
                print(
                    f"[{label}] mesh={s}: {eps:,.0f} ex/s  [mechanics check: OK]",
                    flush=True,
                )


if __name__ == "__main__":
    main()
