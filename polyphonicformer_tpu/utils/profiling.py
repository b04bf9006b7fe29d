"""Tracing / profiling utilities (first-class, unlike the reference which
has none — SURVEY.md §5.1).

* ``trace_context`` wraps a code region in a ``jax.profiler`` trace whose
  output loads in Perfetto / TensorBoard.
* ``StepTimer`` measures steady-state step latency with warmup and reports
  percentiles — the pattern used by bench.py.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace_context(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._count = 0
        self._t: Optional[float] = None

    def __enter__(self):
        self._t = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        ts = sorted(self._times)
        n = len(ts)
        return {
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(int(n * 0.9), n - 1)],
            "steps_per_sec": n / sum(ts),
        }
