"""Tracing and per-phase timing.

The reference's only observability is ``time.time()`` prints scattered in
its drivers (SURVEY.md §5.1).  Here: a phase timer that blocks on device
work (so phases measure compute, not dispatch), and a thin wrapper over
``jax.profiler`` for full XLA traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating named phase timer.

    >>> t = PhaseTimer()
    >>> with t.phase("fit"):
    ...     ...
    >>> t.report()
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        yield
        if sync:
            # drain the dispatch queue so the phase charges device time
            jax.effects_barrier()
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k]}
            for k in self.totals
        }

    def __str__(self):
        return " | ".join(
            f"{k}: {v:.3f}s/{self.counts[k]}" for k, v in self.totals.items()
        )


@contextlib.contextmanager
def trace(logdir: str):
    """XLA profiler trace (open with TensorBoard or ui.perfetto.dev)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
