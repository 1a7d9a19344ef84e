"""
Profiling and throughput metering
=================================

The reference has no tracing beyond tqdm rate displays (SURVEY.md section 5);
the TPU build adds:

  - trace(): jax.profiler trace capture around a pipeline section, enabled
    by setting VSC_TPU_PROFILE_DIR (view with TensorBoard / xprof).
  - Throughput: a tiny images/sec meter the step CLIs feed and expose in
    their progress lines (which the orchestrator dashboard mirrors).
"""

from __future__ import annotations

import contextlib
import os
import time

__all__ = ["trace", "Throughput", "PROFILE_ENV"]

PROFILE_ENV = "VSC_TPU_PROFILE_DIR"


@contextlib.contextmanager
def trace(label: str):
    """jax.profiler trace around a section when VSC_TPU_PROFILE_DIR is set;
    otherwise free."""
    profile_dir = os.environ.get(PROFILE_ENV)
    if not profile_dir:
        yield
        return
    import jax
    target = os.path.join(profile_dir, label)
    os.makedirs(target, exist_ok=True)
    with jax.profiler.trace(target):
        yield


class Throughput:
    """Sliding-window items/sec meter."""

    def __init__(self, window: float = 30.0):
        self.window = window
        self.events: list[tuple[float, int]] = []

    def add(self, n: int = 1) -> None:
        now = time.monotonic()
        self.events.append((now, n))
        cutoff = now - self.window
        while self.events and self.events[0][0] < cutoff:
            self.events.pop(0)

    @property
    def rate(self) -> float:
        if len(self.events) < 2:
            return 0.0
        span = self.events[-1][0] - self.events[0][0]
        if span <= 0:
            return 0.0
        return sum(n for _, n in self.events[1:]) / span
