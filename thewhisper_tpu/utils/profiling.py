"""Profiling and compilation-cache helpers (aux observability, SURVEY s5).

The reference's only tracing is wall-clock accumulators; here:

- ``trace(dir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of everything inside.
- ``annotate(name)``: named host span visible in the trace.
- ``enable_compilation_cache(dir)``: persistent XLA compile cache — on the
  tunneled axon TPU a cold large-v3-turbo generate program compiles in
  minutes; warm restarts then load it in seconds.
- ``Stopwatch``: tiny named accumulator used by the streaming pipeline.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span shown in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> str:
    cache_dir = cache_dir or os.environ.get(
        "WHISPER_COMPILE_CACHE", os.path.expanduser("~/.cache/thewhisper-tpu-xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir


class Stopwatch:
    """Named wall-clock accumulators with context-manager sampling."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def measure(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1e3 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }
