"""Training observability: step timing, throughput counters, device traces
(SURVEY §5 — the reference has only wall-clock prints, main.py:57-58).

``StepTimer`` records per-epoch wall time and examples/s; ``trace`` wraps a
block in a ``jax.profiler`` trace whose output loads in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StepTimer:
    """Accumulates epoch wall-times and derived throughput.

    Note on pipelined (lag-1) training loops: there the timed block contains
    the dispatch of epoch ``e`` plus the completion wait of epoch ``e-1``, so
    interval ``e`` is the steady-state cost of ONE epoch but is offset by one
    from the loss printed next to it, and the first interval is mostly
    compile/dispatch. ``steady_state`` skips the first interval; per-epoch
    attribution in pipelined mode is intentionally approximate.
    """

    def __init__(self, examples_per_epoch: int = 0):
        self.examples_per_epoch = examples_per_epoch
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def last(self) -> float:
        return self.times[-1] if self.times else 0.0

    def steady_state(self, skip: int = 1) -> float:
        """Mean epoch time excluding the first ``skip`` (compile) epochs."""
        rest = self.times[skip:] or self.times
        return sum(rest) / len(rest) if rest else 0.0

    def summary(self) -> Dict[str, float]:
        t = self.steady_state()
        return {
            "epochs": len(self.times),
            "epoch_seconds": t,
            "examples_per_second": (
                self.examples_per_epoch / t if t > 0 else 0.0
            ),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
