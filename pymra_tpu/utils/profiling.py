"""Profiling and tracing as a first-class subsystem.

The reference's only tracing is commented-out ``@profile`` decorators and
ad-hoc ``time.time()`` spans in scripts (SURVEY §5). Here:

  * :class:`PhaseTimer` — accumulate named wall-clock phases
    (plan / compile / sweep / sample), with proper device-sync points;
  * :func:`trace_annotation` — XLA trace annotations that show up in the
    TPU profiler timeline;
  * :func:`profile_to` — capture a JAX profiler trace to a directory
    (view with TensorBoard / xprof).
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

__all__ = ["PhaseTimer", "trace_annotation", "profile_to"]


class PhaseTimer:
    """Accumulates wall time per named phase.

    Example::

        timer = PhaseTimer()
        with timer("plan"):
            plan = build_plan(...)
        with timer("sweep", sync=result):
            result = model.sweep(...)
        print(timer.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:>16s}: {t:8.3f}s  ({c} calls, "
                         f"{1000 * t / c:.1f} ms/call)")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {k: {"total_s": v, "calls": self.counts[k]}
                for k, v in self.totals.items()}


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in the XLA/TPU profiler timeline."""
    import jax.profiler

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(logdir: str):
    """Capture a device trace for TensorBoard/xprof."""
    import jax.profiler

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
