"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference's observability is criterion benches plus checked-in `perf`
captures; in-protocol logging is println gated on a VERBOSE global.  Here:
structured per-phase wall-clock timers plus optional jax.profiler traces.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax


class PhaseTimer:
    """Collects named phase durations; blocks on device completion so the
    numbers are real compute times, not dispatch times."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *block_on):
        t0 = time.perf_counter()
        yield
        if block_on:
            jax.block_until_ready(block_on)
        self.phases[name] = self.phases.get(name, 0.0) + (
            time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k}: {v*1e3:.2f} ms ({v/total*100:.1f}%)"
                 for k, v in sorted(self.phases.items(),
                                    key=lambda kv: -kv[1])]
        lines.append(f"total: {total*1e3:.2f} ms")
        return "\n".join(lines)

    def json(self) -> str:
        return json.dumps({k: round(v, 6) for k, v in self.phases.items()})


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
