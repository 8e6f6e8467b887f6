"""Profiling hooks: jax.profiler traces + lightweight step timing.

The reference has no tracing at all (only wall-clock prints,
run_ted.py:426-438); here `trace()` captures an XLA trace viewable in
TensorBoard/Perfetto and StepTimer gives s/iter percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/hop_tpu_trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.durations = []
        self._t = None

    def start(self):
        self._t = time.perf_counter()

    def stop(self):
        assert self._t is not None
        self.durations.append(time.perf_counter() - self._t)
        self._t = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> dict:
        d = np.asarray(self.durations)
        if d.size == 0:
            return {}
        return {"mean_s": float(d.mean()), "p50_s": float(np.median(d)),
                "p95_s": float(np.percentile(d, 95)),
                "steps_per_sec": float(1.0 / d.mean())}
