"""Profiling and step timing.

The reference's only instrumentation is wall-clock deltas printed per epoch
(mesh/dmm_utils.py:426, 715-722).  Here:

* ``StepTimer`` — cheap steady-state step timing with compile-time split
  (first call isolated), percentile summary.
* ``trace`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace for any code region.
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional


class StepTimer:
    def __init__(self):
        self.compile_s: Optional[float] = None
        self.steps_s: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if self.compile_s is None:
            self.compile_s = dt
        else:
            self.steps_s.append(dt)

    def summary(self) -> dict:
        import numpy as np
        if not self.steps_s:
            return {"compile_s": self.compile_s}
        a = np.asarray(self.steps_s)
        return {
            "compile_s": self.compile_s,
            "steps": len(a),
            "mean_ms": float(a.mean() * 1e3),
            "p50_ms": float(np.percentile(a, 50) * 1e3),
            "p95_ms": float(np.percentile(a, 95) * 1e3),
            "steps_per_sec": float(1.0 / a.mean()),
        }


@contextlib.contextmanager
def trace(log_dir: str = "logs/profile"):
    """jax.profiler trace around a region; view with TensorBoard."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
