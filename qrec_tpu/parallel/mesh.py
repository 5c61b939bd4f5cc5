"""Device-mesh construction and canonical shardings.

The reference has no multi-device story at all (SURVEY §2.8: the only
parallelism is process-per-CV-fold, QRec.py:78-89). The TPU-native design:
one 2-D logical mesh ``('data', 'model')`` —

* embedding tables row-sharded over ``'model'`` (the tables are the only
  large state in recommender workloads; lookups become XLA-inserted
  collectives over ICI);
* batches sharded over ``'data'`` with gradient psum inserted by GSPMD;
* full-catalog evaluation item-sharded over ``'model'`` with an explicit
  shard_map top-k merge (parallel/topk.py) — the structural analogue of
  sequence/context parallelism for this workload.

Multi-host: call ``jax.distributed.initialize`` before building the mesh;
the same code then spans DCN-connected hosts.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the first ``n_devices`` devices.

    ``model_parallel`` fixes the model-axis size; by default it is 2 when the
    device count is even (so embedding row-sharding is exercised), else 1.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    devices = devices[:n]
    if model_parallel is None:
        model_parallel = 2 if n % 2 == 0 and n >= 2 else 1
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model={model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


class Shardings(NamedTuple):
    """Canonical placement set for recommender training."""

    embedding: NamedSharding  # rows over 'model'
    batch: NamedSharding  # leading dim over 'data'
    replicated: NamedSharding

    def params(self, params: dict) -> dict:
        """Place an embedding-table param tree: 2-D tables row-sharded,
        everything else replicated."""
        return {
            k: jax.device_put(
                v,
                self.embedding
                if getattr(v, "ndim", 0) == 2 and "emb" in k
                else self.replicated,
            )
            for k, v in params.items()
        }


def shardings(mesh: Mesh) -> Shardings:
    return Shardings(
        embedding=NamedSharding(mesh, P(MODEL_AXIS, None)),
        batch=NamedSharding(mesh, P(DATA_AXIS)),
        replicated=NamedSharding(mesh, P()),
    )
