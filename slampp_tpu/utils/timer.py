"""Phase timers with accumulated per-phase breakdowns.

Reference analog: ``CTimer``/``CTimerSampler`` (include/slam/Timer.h:269,391)
and the per-phase accumulators every solver keeps (lambda refresh, RHS,
Cholesky, norm, vertex update, marginals) printed by ``Dump()``.
Device work is asynchronous under JAX; phases that need accurate device timing
should block on results first (the solvers call ``float()`` on step outputs,
which synchronizes).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class PhaseTimer:
    def __init__(self):
        self.acc = defaultdict(float)
        self.counts = defaultdict(int)
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def phase(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t
            self.acc[name] += dt
            self.counts[name] += 1

    def total(self) -> float:
        return time.perf_counter() - self._t0

    def dump(self) -> None:
        print("=== timing breakdown ===")
        for name in sorted(self.acc, key=self.acc.get, reverse=True):
            print(f"  {name:<24s} {self.acc[name]:9.4f} s  ({self.counts[name]} calls)")
        print(f"  {'wall total':<24s} {self.total():9.4f} s")
