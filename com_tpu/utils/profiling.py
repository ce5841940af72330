"""Tracing & profiling utilities.

The reference has wall-clock meters only (train_utils.py:75-106 AverageMeters,
--infer_time with CUDA_LAUNCH_BLOCKING; SURVEY §5).  Here:

* ``trace(logdir)`` — context manager around jax.profiler for full device
  traces (view in TensorBoard / xprof);
* ``StepTimer`` — data/compute wall-time split per step with running averages
  (same numbers the reference logs every 50 iters);
* ``device_memory_stats()`` — live per-device HBM stats when the backend
  exposes them.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """data_time / step_time meters (train_utils.py per-iter timing parity)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.data_sum = self.step_sum = 0.0
        self.count = 0
        self._mark = time.perf_counter()

    def data_done(self):
        now = time.perf_counter()
        self._data = now - self._mark
        self._mark = now

    def step_done(self):
        now = time.perf_counter()
        self.data_sum += self._data
        self.step_sum += now - self._mark
        self._mark = now
        self.count += 1

    @property
    def avg_data(self):
        return self.data_sum / max(self.count, 1)

    @property
    def avg_step(self):
        return self.step_sum / max(self.count, 1)


def device_memory_stats():
    out = {}
    for d in jax.devices():
        try:
            out[str(d)] = d.memory_stats()
        except Exception:
            out[str(d)] = None
    return out
