"""Tracing / profiling hooks — the observability subsystem the reference
lacks entirely (SURVEY.md §5: "Tracing/profiling: absent").

Thin wrappers over jax.profiler so every pipeline stage is annotated in
TPU traces, plus a host-side stage timer for CLI summaries.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator

import jax


def annotate(name: str):
    """Trace annotation context (shows up in TensorBoard/XProf traces)."""
    return jax.profiler.TraceAnnotation(name)


def annotate_fn(name: str):
    """Decorator: wrap a function in a named trace annotation."""

    def deco(fn):
        def wrapped(*a, **k):
            with jax.profiler.TraceAnnotation(name):
                return fn(*a, **k)

        wrapped.__name__ = getattr(fn, "__name__", name)
        return wrapped

    return deco


@contextlib.contextmanager
def trace_to(dir_path: str) -> Iterator[None]:
    """Capture a device trace into `dir_path` (view with xprof/TensorBoard)."""
    jax.profiler.start_trace(dir_path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Host-side accumulating stage timer (blocks on device completion so
    the numbers mean something)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:28s} {t:8.3f}s total  {t / max(c, 1) * 1e3:8.2f}ms/call  x{c}")
        return "\n".join(lines)
