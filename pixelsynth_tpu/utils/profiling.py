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


def time_compiled(fn, *args, reps: int = 10, warmup: int = 1) -> float:
    """Trustworthy-by-construction device timing: mean seconds per call.

    Wraps `fn` so each rep ends in a scalar readback.  Under remote
    platforms (the axon tunnel) `block_until_ready` returns before the
    device work is observable and adds ~35 ms of jittery dispatch
    latency, so timings must be paced by a value actually crossing the
    wire; this helper encodes that discipline (every number in
    ROADMAP/bench is measured this way).

    fn: jittable callable; its output tree is reduced to one scalar.
    """
    import jax.numpy as jnp

    def scalarized(*a):
        out = fn(*a)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(jnp.abs(jnp.asarray(x).astype(jnp.float32)))
                   for x in leaves)

    g = jax.jit(scalarized)
    for _ in range(max(1, warmup)):
        float(g(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(g(*args))
    return (time.perf_counter() - t0) / reps
