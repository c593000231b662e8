"""Per-stage wall-clock timers + optional jax.profiler tracing.

The reference only has ad-hoc time.time() spans (SURVEY.md §5); here
profiling is first-class: StageTimer accumulates named spans and can wrap a
jax.profiler trace session.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1000.0 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }

    def report(self) -> str:
        lines = []
        for k, v in sorted(self.summary().items()):
            lines.append(
                f"{k:30s} total {v['total_s']:8.3f}s  n={v['count']:5d}  "
                f"mean {v['mean_ms']:8.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler trace context when trace_dir is given."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
