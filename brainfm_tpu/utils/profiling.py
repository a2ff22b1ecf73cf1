"""Profiling / tracing hooks.

The reference has only ad-hoc wall-clock prints and cuda memory counters
(utils/misc.py:759-829, :151) — SURVEY.md §5 calls for proper traces here:
jax.profiler integration (XLA/TPU timeline for xprof/tensorboard) plus
lightweight step timing and device-memory stats.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in tensorboard/xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region inside a trace (shows up on the TPU timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats(device=None) -> dict:
    """HBM usage (the TPU analog of torch.cuda.max_memory_allocated,
    utils/misc.py:151)."""
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", 0),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
        "bytes_limit": stats.get("bytes_limit", 0),
    }


class StepTimer:
    """Blocking step timer with warmup discard."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._n = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self):
        return sum(self.times) / max(len(self.times), 1)
