"""Tracing and structured timing.

The reference instruments manually (per-window steps_time, per-metric
timings in JSONL rows — SURVEY.md §5.1) with no profiler integration. Here
the same structured timing fields feed the results DBs, plus `jax.profiler`
traces on demand: wrap any hot region in `trace(logdir)` and inspect with
TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional


class Timings:
    """Accumulate named wall-clock segments; dict-dumpable into JSONL rows."""

    def __init__(self):
        self._acc: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            self._acc[name] = self._acc.get(name, 0.0) + time.time() - t0

    def as_dict(self, prefix: str = "") -> Dict[str, float]:
        return {f"{prefix}{k}_time": round(v, 4) for k, v in self._acc.items()}


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-trace (shows up in the profiler timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
