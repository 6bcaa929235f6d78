"""Profiling hooks: jax.profiler traces + step timing aggregation.

The reference has no profiling beyond ad-hoc CUDA-memory prints
(train_vae.py:232-234, SURVEY.md §5); here tracing is first-class:

    with trace_if("/tmp/trace", step, every=500):
        state, logs = train_step(...)

writes a TensorBoard-compatible trace every N steps, and ``StepTimer`` keeps
an EMA of step latency with percentile summaries.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace_if(logdir: str, step: int, every: int = 500, enabled: bool = True):
    """Capture a jax.profiler trace on steps where step % every == 0."""
    import jax

    if enabled and every > 0 and step % every == 0 and step > 0:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield


class StepTimer:
    def __init__(self, window: int = 200):
        self.window = window
        self.samples: list[float] = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        """Call once per step; returns the last step's duration (s)."""
        now = time.time()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.samples.append(dt)
            if len(self.samples) > self.window:
                self.samples.pop(0)
        self._last = now
        return dt

    def summary(self) -> dict:
        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "step_time_mean_s": float(arr.mean()),
            "step_time_p50_s": float(np.percentile(arr, 50)),
            "step_time_p95_s": float(np.percentile(arr, 95)),
            "steps_per_s": float(1.0 / max(arr.mean(), 1e-9)),
        }
