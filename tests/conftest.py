"""Test configuration: run everything on CPU with 8 virtual devices so
sharding logic (mesh tests) is exercised without TPU hardware."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment may pin JAX_PLATFORMS to a TPU plugin (e.g. axon) via
# sitecustomize; override at the config level, which wins after import.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def tiny_conf():
    """Minimal ranking config dict (mirrors config/BPR.conf)."""
    from qrec_tpu.config import ModelConf

    return ModelConf(
        {
            "ratings": "unused",
            "ratings.setup": "-columns 0 1 2",
            "model.name": "BPR",
            "evaluation.setup": "-ap 0.2",
            "item.ranking": "on -topN 5",
            "num.factors": "8",
            "num.max.epoch": "3",
            "batch_size": "16",
            "learnRate": "-init 0.01 -max 1",
            "reg.lambda": "-u 0.001 -i 0.001 -b 0.2 -s 0.2",
            "output.setup": "off -dir ./results/",
        }
    )


@pytest.fixture
def tiny_data(tiny_conf):
    """Small deterministic Interactions: 6 users × 8 items."""
    from qrec_tpu.data.dataset import Interactions

    rng = np.random.RandomState(7)
    train, test = [], []
    for u in range(6):
        items = rng.choice(8, size=5, replace=False)
        for i in items[:4]:
            train.append([f"u{u}", f"i{i}", float(rng.randint(1, 6))])
        test.append([f"u{u}", f"i{items[4]}", float(rng.randint(1, 6))])
    return Interactions(tiny_conf, train, test)
