"""Profiling hooks: jax.profiler traces + simple step timers.

Role of the reference's wall-clock Timer instrumentation
(experiments/utils.py:872-903, SURVEY.md §5 'Tracing/profiling'), extended
with TPU-native tracing: write an XPlane trace viewable in TensorBoard /
Perfetto with ``with trace("/tmp/trace"): ...``.
"""
from __future__ import annotations

import contextlib
import time

import jax

from framedipt_tpu.tools.log import get_logger

logger = get_logger()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context; view with tensorboard --logdir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {log_dir}")


class StepTimer:
    """Steps/sec over a sliding window (device-synchronizing)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []

    def step(self, result=None) -> float | None:
        if result is not None:
            jax.block_until_ready(result)
        self._times.append(time.perf_counter())
        if len(self._times) > self.window:
            self._times.pop(0)
        if len(self._times) < 2:
            return None
        dt = self._times[-1] - self._times[0]
        return (len(self._times) - 1) / dt if dt > 0 else None
