"""Profiling utilities — the tracing layer the reference lacks
(SURVEY.md §5: only per-episode STEPS_PER_SECOND prints).

``trace`` wraps a block in a ``jax.profiler`` trace (viewable in
TensorBoard or Perfetto); ``StepTimer`` measures steady-state step times
with host-fetch synchronization (``block_until_ready`` is a no-op on the
axon TPU-tunnel backend — see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_sync(tree) -> None:
    """Synchronize by fetching one scalar element of one leaf to host."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(jax.tree.leaves(tree)[0]).ravel()[:1]


class StepTimer:
    """Steady-state step timing: warmup iterations are discarded, each
    measured call is synced via a host fetch."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._calls = 0

    @contextlib.contextmanager
    def measure(self, sync_tree=None):
        t0 = time.perf_counter()
        yield
        if sync_tree is not None:
            force_sync(sync_tree)
        dt = time.perf_counter() - t0
        self._calls += 1
        if self._calls > self.warmup:
            self.times.append(dt)

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    @property
    def p50(self) -> float:
        return float(np.median(self.times)) if self.times else float("nan")

    def summary(self) -> dict:
        return {"mean_s": self.mean, "p50_s": self.p50,
                "n": len(self.times)}
