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

Multi-host: :func:`maybe_initialize_distributed` (env-gated
``jax.distributed.initialize``) runs before the mesh is built; the same code
then spans DCN-connected hosts.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

_distributed_initialized = False


def maybe_initialize_distributed(conf=None) -> bool:
    """Env-gated multi-host initialization (DCN): call once per process
    before building a mesh; the same mesh/sharding code then spans hosts.

    Activates when ``QREC_COORDINATOR`` is set (value =
    ``<coordinator_address>``) together with ``QREC_NUM_PROCESSES`` and
    ``QREC_PROCESS_ID``, or when JAX's own ``JAX_COORDINATOR_ADDRESS`` /
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` env triplet is present (then
    ``jax.distributed.initialize()`` reads them itself). Returns True when
    initialization ran (idempotent — safe to call per fold).

    Launcher sketch (one process per host)::

        QREC_COORDINATOR=host0:8476 QREC_NUM_PROCESSES=2 \\
        QREC_PROCESS_ID=$i python main.py config/LightGCN.conf

    The reference has no multi-host story (SURVEY §2.8); this is the DCN
    commitment from the build plan (SURVEY §7.3).
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    import os

    coord = os.environ.get("QREC_COORDINATOR")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["QREC_NUM_PROCESSES"]),
            process_id=int(os.environ["QREC_PROCESS_ID"]),
        )
        _distributed_initialized = True
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        _distributed_initialized = True
        return True
    return False


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
        everything else replicated. Tables whose row count is not divisible
        by the model-axis size fall back to replication — NamedSharding
        requires exact divisibility, and real id spaces (lastfm: 1889 train
        users) are rarely multiples of the axis; correctness first, the
        even-table fast path when shapes allow."""
        model_n = self.embedding.mesh.shape[MODEL_AXIS]

        def placement(k, v):
            if (
                getattr(v, "ndim", 0) == 2
                and "emb" in k
                and v.shape[0] % model_n == 0
            ):
                return self.embedding
            return self.replicated

        return {
            k: jax.device_put(v, placement(k, v)) for k, v in params.items()
        }


def shardings(mesh: Mesh) -> Shardings:
    return Shardings(
        embedding=NamedSharding(mesh, P(MODEL_AXIS, None)),
        batch=NamedSharding(mesh, P(DATA_AXIS)),
        replicated=NamedSharding(mesh, P()),
    )
