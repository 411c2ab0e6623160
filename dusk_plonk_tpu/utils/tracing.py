"""Tracing / metrics (SURVEY.md §5.1, §5.5: the reference has none — its
`debug` CDF feature is documented but absent.  This is new, TPU-first
observability: wall-clock spans around host<->device sync points plus
monotonic op counters, cheap enough to stay always-on).

Usage:
    from dusk_plonk_tpu.utils.tracing import tracer
    with tracer.span("round1"):
        ...
    tracer.count("msm_commits", 1)
    print(tracer.report())
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


class Tracer:
    def __init__(self):
        self.spans: dict[str, float] = defaultdict(float)
        self.calls: dict[str, int] = defaultdict(int)
        self.counters: dict[str, int] = defaultdict(int)
        self.enabled = True

    @contextmanager
    def span(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] += time.perf_counter() - t0
            self.calls[name] += 1

    def count(self, name: str, inc: int = 1):
        if self.enabled:
            self.counters[name] += inc

    def add_span(self, name: str, seconds: float):
        """Record an externally-timed span (used by the engine's per-round
        marks so its existing timing dict and the tracer stay in sync)."""
        if self.enabled:
            self.spans[name] += seconds
            self.calls[name] += 1

    def reset(self):
        self.spans.clear()
        self.calls.clear()
        self.counters.clear()

    def report(self) -> dict:
        """{"spans": {name: {"seconds", "calls"}}, "counters": {...}}"""
        return {
            "spans": {k: {"seconds": round(v, 4), "calls": self.calls[k]}
                      for k, v in sorted(self.spans.items())},
            "counters": dict(sorted(self.counters.items())),
        }


tracer = Tracer()
