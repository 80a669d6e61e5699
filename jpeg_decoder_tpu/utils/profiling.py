"""Tracing / profiling utilities.

The reference includes ``<chrono>`` but never times anything (jpeg.cpp:8,
SURVEY.md §5).  This module provides (a) lightweight per-stage wall-clock
counters with MP/s reporting and (b) a ``jax.profiler`` trace context for
device-side inspection (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating per-stage wall-clock timer.

    >>> t = StageTimer()
    >>> with t.stage("entropy"): ...
    >>> t.report(megapixels=12.5)
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, megapixels: float | None = None) -> str:
        lines = []
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            line = (f"{name:>16s}: {total * 1e3:8.1f} ms "
                    f"({self.counts[name]} calls)")
            if megapixels:
                line += f"  {megapixels / total:8.1f} MP/s"
            lines.append(line)
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (device + host annotations)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named host annotation that shows up in profiler traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
