"""Profiling / tracing utilities.

The reference has only wall-clock throughput counters (SURVEY.md §5;
pretrain.py:617-641). Here:

  * ``StepTimer`` — per-step host timing with EMA + percentile summary
    (the reference's ex/s counters, structured).
  * ``trace(logdir)`` — context manager around jax.profiler for device
    traces viewable in TensorBoard / xprof.
  * ``annotate(name)`` — jax.profiler.TraceAnnotation passthrough for
    labeling pipeline phases inside traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StepTimer:
    def __init__(self, smooth: float = 0.99):
        self.smooth = smooth
        self.ema: Optional[float] = None
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        dt = time.perf_counter() - self._t0
        self.samples.append(dt)
        self.ema = dt if self.ema is None else (
            self.smooth * self.ema + (1 - self.smooth) * dt)

    def summary(self) -> Dict[str, float]:
        if not self.samples:
            return {}
        s = sorted(self.samples)
        n = len(s)
        return {"mean_s": sum(s) / n, "p50_s": s[n // 2],
                "p90_s": s[int(n * 0.9)], "ema_s": self.ema,
                "steps_per_s": n / sum(s)}


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace (open with TensorBoard's profile plugin)."""
    import jax
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:  # backends without profiler support (e.g. tunnels)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    import jax
    return jax.profiler.TraceAnnotation(name)
