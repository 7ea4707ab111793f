"""Per-phase wall-time profiling and trace hooks (SURVEY.md §5 tracing).

The reference has no per-pass timers; this module provides:

* ``Timer`` — named wall-time accumulators with device-sync fences.  On the
  tunneled axon backend ``block_until_ready`` on chained dispatches can
  return early, so the fence materializes a tiny host copy by default.
* ``trace`` — context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory when requested.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


def sync(tree) -> None:
    """Reliable device fence: host-copies one leaf (see bench.py note on
    axon's block_until_ready)."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[-1])


class Timer:
    """Accumulating named phase timers.

    Usage::

        t = Timer()
        with t.phase("push", fence=lambda: state):
            state = step(fields, state)
        print(t.report())

    ``fence`` is evaluated at context *exit*, so pass a zero-arg callable
    returning the phase's output buffers (a plain PyTree fences whatever was
    materialized at entry, which under async dispatch excludes the phase's
    own device work).
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, fence=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence is not None:
                sync(fence() if callable(fence) else fence)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": total,
                "count": self.counts[name],
                "mean_ms": 1e3 * total / max(self.counts[name], 1),
            }
            for name, total in sorted(self.totals.items())
        }


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
