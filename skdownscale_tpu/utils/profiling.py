"""Profiling / tracing hooks.

The reference has no profiler (SURVEY.md §5 — dask's dashboard is the implied
profiler).  Here: ``jax.profiler`` trace annotations around the framework's
stages plus a lightweight wall-clock stage report, which is also how the
north-star metric (cells/sec) is measured by ``bench.py``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["annotate", "StageTimer", "trace_to"]


def annotate(name: str):
    """jax.profiler TraceAnnotation context (shows up in xprof/tensorboard)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a device trace for the enclosed block (view with xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage accounting with device-sync barriers.

    Note: on the tunneled single-chip platform ``block_until_ready`` can
    return before execution completes, so ``sync`` pulls a tiny host read
    when given an array.
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        with annotate(name):
            yield
            if sync is not None:
                self._barrier(sync)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    @staticmethod
    def _barrier(arrays):
        import jax.numpy as jnp

        leaves = jax.tree_util.tree_leaves(arrays)
        if leaves:
            float(jnp.sum(leaves[0].ravel()[:1]))

    def report(self) -> str:
        lines = ["stage                          total_s  calls   mean_ms"]
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<30} {tot:7.3f} {n:6d} {1000 * tot / n:9.2f}")
        return "\n".join(lines)
