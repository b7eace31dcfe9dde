"""Tracing / profiling utilities (SURVEY.md §5.1 upgrade).

The reference's tracing is ad-hoc: one ``perf_counter`` span around the LU
factorization, function-attribute iteration counters on closures, and
plain-print ``iprint`` tags (reference NavierStokes_Solver.py:177,
ConvectionDiffusion_Solver.py:133-135).  Here:

* every solver already keeps structured counters (``iter_count_solve``,
  ``last_info``/``last_schur_info`` KrylovInfo tuples, ``MDAStats``);
* :class:`phase_timer` provides named wall-clock spans with a report;
* :func:`trace` wraps a region in a ``jax.profiler`` trace whose output can
  be opened in TensorBoard/Perfetto — the device-level view the reference
  never had.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["PhaseTimer", "trace"]


class PhaseTimer:
    """Named wall-clock phase accumulator.

    >>> timer = PhaseTimer()
    >>> with timer("assembly"): ...
    >>> with timer("solve"): ...
    >>> timer.report()
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self, out=print):
        width = max((len(k) for k in self.totals), default=0)
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            out(f"{name:<{width}}  {total:10.3f}s  x{self.counts[name]}")


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a ``jax.profiler`` device trace of the enclosed region."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
