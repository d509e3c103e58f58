"""Lightweight stage timing + pipeline metrics.

Observability parity with the reference's ad-hoc glog wall-clock timers
(estimator.cpp:181-195, backend.cpp:34-38, mapping.cpp:146-189): every
pipeline stage records wall time into a process-wide registry; the
estimator exposes a ``stats()`` snapshot (counts, means, totals) and the
CLI prints it on demand.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict


class StageTimers:
    def __init__(self):
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)
        self.max: Dict[str, float] = defaultdict(float)

    @contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.total[name] += dt
            self.count[name] += 1
            self.max[name] = max(self.max[name], dt)

    def reset(self):
        """Drop accumulated stats (e.g. after a warmup phase, so reports
        reflect steady state rather than compile time)."""
        self.total.clear()
        self.count.clear()
        self.max.clear()

    def snapshot(self) -> dict:
        return {
            name: {
                "count": self.count[name],
                "mean_ms": 1000.0 * self.total[name] / max(self.count[name], 1),
                "max_ms": 1000.0 * self.max[name],
                "total_s": self.total[name],
            }
            for name in sorted(self.total)
        }

    def report(self) -> str:
        lines = [f"{'stage':<22} {'count':>6} {'mean ms':>9} "
                 f"{'max ms':>9} {'total s':>8}"]
        for name, s in self.snapshot().items():
            lines.append(f"{name:<22} {s['count']:>6} {s['mean_ms']:>9.1f} "
                         f"{s['max_ms']:>9.1f} {s['total_s']:>8.2f}")
        return "\n".join(lines)


TIMERS = StageTimers()

# process-wide event counters (e.g. observations skipped by fixed-capacity
# truncation — recorded rather than silently dropped)
COUNTERS: Dict[str, int] = defaultdict(int)
