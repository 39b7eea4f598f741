"""Profiling/tracing utilities (the reference has none — SURVEY §5 flags this
as a free improvement: jax.profiler traces + per-step timing)."""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard-viewable device trace around a code block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock step timer with throughput accounting."""

    def __init__(self, window: int = 50):
        self.times: deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        """Call once per step; returns the last step duration (or None)."""
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.times.append(dt)
        self._last = now
        return dt

    @property
    def mean_step_time(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def throughput(self, items_per_step: int) -> float:
        m = self.mean_step_time
        return items_per_step / m if m == m and m > 0 else float("nan")
