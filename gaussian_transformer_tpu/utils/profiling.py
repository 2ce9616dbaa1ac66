"""Tracing / profiling utilities.

The reference's only instrumentation is a CUDA-event pair per train iteration
logged to TensorBoard as ``iter_time`` (``/root/reference/train.py:44-45,67,
95,107,160``). TPU-native equivalents:

  * ``StepTimer`` — host wall-clock per step with the reference's EMA
    smoothing, millisecond ``iter_time`` scalars;
  * ``trace`` — context manager around ``jax.profiler`` producing a
    TensorBoard-loadable trace directory (XLA ops, fusion, HBM traffic);
  * ``annotate`` — ``jax.profiler.TraceAnnotation`` passthrough for custom
    spans inside the step.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """EMA-smoothed per-iteration wall timer (train.py uses 0.4/0.6 EMA on the
    progress bar; iter_time is logged raw per step)."""

    def __init__(self, ema: float = 0.4):
        self.ema_weight = ema
        self.ema_ms: Optional[float] = None
        self.last_ms: Optional[float] = None
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.last_ms = (time.perf_counter() - self._t0) * 1000.0
        if self.ema_ms is None:
            self.ema_ms = self.last_ms
        else:
            self.ema_ms = self.ema_weight * self.last_ms + (1 - self.ema_weight) * self.ema_ms
        return False


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a traced region."""
    return jax.profiler.TraceAnnotation(name)


def device_memory_stats() -> dict:
    """Per-device live-memory snapshot (bytes); empty dict on backends that
    do not expose memory_stats."""
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
