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
import numpy as np


def wait_for(tree) -> None:
    """Wait until the computation producing ``tree`` has actually run.

    ``jax.block_until_ready`` is NOT sufficient on the axon remote-TPU
    backend: the relay acks enqueue, not completion (measured: block
    returned in 0.5 ms on a 240 s computation — PERF.md methodology).
    Fetching any output buffer of the program forces real completion, so
    this fetches the smallest leaf (plus block_until_ready for backends
    where it is correct and fetch-free)."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        np.asarray(min(leaves, key=lambda x: x.size))
    jax.block_until_ready(tree)


class PhaseTimer:
    """Collects named phase durations; forces device completion
    (``wait_for``) so the numbers are real compute times, not dispatch
    times."""

    def __init__(self):
        self.phases: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *block_on):
        t0 = time.perf_counter()
        yield
        if block_on:
            wait_for(block_on)
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
