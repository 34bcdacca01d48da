"""Profiling / tracing hooks (the reference has none — SURVEY.md §5).

Thin wrappers over jax.profiler plus a host-side step timer, so training
loops get per-step wall/device timing and on-demand TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a TensorBoard/Perfetto trace of the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a trace (shows up in the timeline)."""
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling per-step wall-clock stats; call .tick() once per step."""

    def __init__(self, warmup: int = 2, window: int = 100):
        self.warmup = warmup
        self.window = window
        self._times: List[float] = []
        self._last: Optional[float] = None
        self._count = 0

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                dt = now - self._last
                self._times.append(dt)
                if len(self._times) > self.window:
                    self._times.pop(0)
        self._last = now
        return dt

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        import numpy as np

        t = np.asarray(self._times)
        return {
            "step_time_mean_s": float(t.mean()),
            "step_time_p50_s": float(np.percentile(t, 50)),
            "step_time_p95_s": float(np.percentile(t, 95)),
            "steps_per_sec": float(1.0 / t.mean()),
        }


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage when the backend exposes it."""
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            if s:
                out[str(d)] = {
                    "bytes_in_use": s.get("bytes_in_use", 0),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use", 0),
                }
        except Exception:
            continue
    return out
