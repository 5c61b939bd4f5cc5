"""Checkpoint / resume for training state (SURVEY §5).

The reference has only stub hooks (base/recommender.py:74-78) plus in-memory
best-embedding snapshots (iterativeRecommender.py:143-146). Here: real
on-disk checkpointing of arbitrary train-state pytrees (params + optimizer
state + epoch counter) via orbax, with retention and latest-step restore —
enough to resume a long run after preemption.

Opt-in through the config surface:

    checkpoint.setup=on -dir ./checkpoints/ -every 10
"""

from __future__ import annotations

import os
from typing import Any, Optional


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        import orbax.checkpoint as ocp

        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        import orbax.checkpoint as ocp

        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        if template is not None:
            return self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self.manager.restore(step)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()


def from_config(conf) -> Optional["Checkpointer"]:
    """Build a Checkpointer from ``checkpoint.setup`` (None when off)."""
    if not conf.contains("checkpoint.setup"):
        return None
    opts = conf.options("checkpoint.setup")
    if not opts.isMainOn():
        return None
    return Checkpointer(opts.get("-dir", "./checkpoints/"))


def checkpoint_every(conf) -> int:
    if not conf.contains("checkpoint.setup"):
        return 0
    opts = conf.options("checkpoint.setup")
    return opts.get_int("-every", 10)
