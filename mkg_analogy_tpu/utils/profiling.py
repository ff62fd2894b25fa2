"""Profiling / tracing hooks (SURVEY.md §5 — the reference has none).

- ``trace(log_dir)``  — context manager around jax.profiler.trace; produces
  a TensorBoard-/Perfetto-loadable trace of the enclosed steps.
- ``StepTimer``       — lightweight per-step wall-clock stats (p50/p95)
  without device synchronization overhead beyond the blocking the caller
  already does.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 200):
        self.window = window
        self.samples: List[float] = []
        self._t0 = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self.samples.append(time.perf_counter() - self._t0)
            self._t0 = None
            if len(self.samples) > self.window:
                del self.samples[: -self.window]

    def stats(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {
            "step_ms_p50": 1000 * s[n // 2],
            "step_ms_p95": 1000 * s[min(n - 1, int(n * 0.95))],
            "steps_per_sec": 1.0 / (sum(s) / n),
        }
