"""Profiling/tracing utilities.

The reference instruments with ad-hoc ``time.time()`` spans
(main.py:299-331, model_core.py:171-226).  Here: a structured timer
registry plus first-class ``jax.profiler`` trace capture (viewable with
TensorBoard / xprof) for the TPU hot paths.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from collections import defaultdict

import jax


@dataclasses.dataclass
class Timer:
    """Accumulating named span timer."""

    totals: dict = dataclasses.field(default_factory=lambda: defaultdict(float))
    counts: dict = dataclasses.field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def span(self, name: str):
        st = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - st
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(1, self.counts[name]),
            }
            for name in self.totals
        }


@contextlib.contextmanager
def trace_context(trace_dir: str | None):
    """Capture a jax.profiler trace (TPU timeline) when a directory is
    given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def timed(label: str, log=print):
    st = time.perf_counter()
    yield
    log(f"{label}: {time.perf_counter() - st:.4f}s")
