"""Profiling/tracing helpers.

The reference has no tracing beyond wall-clock prints (SURVEY.md section
5); this exposes the JAX profiler (XLA trace viewer) plus a trivial
wall-clock section timer for host-side stages."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Accumulating wall-clock timer for host-side pipeline stages."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k],
                "mean_ms": round(v / self.counts[k] * 1000, 3)}
            for k, v in sorted(self.totals.items())
        }
