"""Profiling / step timing (aux subsystem).

The reference's observability is hand-rolled AverageMeter wall-clock timers
(ref tools/train_linemod.py:69-70,144,156). TPU equivalent: a step timer
with device synchronization plus jax.profiler trace capture for perfetto /
tensorboard.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StepTimer:
    """Wall-clock step timing with optional device sync."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if self.sync and result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        import numpy as np
        t = np.asarray(self.times[1:] or self.times)  # drop compile step
        return {
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps": len(self.times),
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with tensorboard or perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces."""
    with jax.profiler.TraceAnnotation(name):
        yield
