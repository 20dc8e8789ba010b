"""Tracing / profiling: structured timing spans + jax.profiler hooks.

The reference's only instrumentation is scattered ``time.perf_counter``
prints (reference: nba_proj/train/training_chunk_works.py:208-215,
nba_proj/db_maintainence/build_embeddings_store.py:160-195,
nba_proj/db_maintainence/db_rebuild_chunk.py:53). Here spans are a
context manager that aggregates into a report, and device profiling
wraps ``jax.profiler.trace`` (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Profiler:
    """Aggregating span timer: ``with prof.span('embed'): ...``."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name]
                                 / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }

    def print_report(self) -> None:
        for name, row in self.report().items():
            print(f"[prof] {name}: total={row['total_s']}s "
                  f"n={row['count']} mean={row['mean_ms']}ms")

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


_GLOBAL: Profiler | None = None


def active() -> Profiler | None:
    """The process-wide profiler, created on first use when the
    ``VRT_PROFILE`` env var is set (else None). The CLI prints its
    report at exit; library code adds spans via :func:`span`."""
    global _GLOBAL
    import os

    if _GLOBAL is None and os.environ.get("VRT_PROFILE"):
        _GLOBAL = Profiler()
    return _GLOBAL


@contextlib.contextmanager
def span(name: str):
    """No-op unless VRT_PROFILE is set — hot paths can instrument
    unconditionally at zero cost in production."""
    p = active()
    if p is None:
        yield
    else:
        with p.span(name):
            yield


def print_global_report() -> None:
    if _GLOBAL is not None and _GLOBAL.totals:
        _GLOBAL.print_report()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA device trace (jax.profiler) around a region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(name: str, verbose: bool = True):
    """One-off span matching the reference's inline prints."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if verbose:
            print(f"[prof] {name}: {time.perf_counter() - t0:.3f}s")
