"""Profiling utilities — the tracing layer the reference lacks
(SURVEY.md §5: only per-episode STEPS_PER_SECOND prints).

``trace`` wraps a block in a ``jax.profiler`` trace (viewable in
TensorBoard or Perfetto); ``StepTimer`` measures steady-state step times
with host-fetch synchronization (``block_until_ready`` is a no-op on the
axon TPU-tunnel backend — see .claude/skills/verify/SKILL.md);
``summarize_trace``/``format_op_table`` turn a captured trace into a
per-HLO device-time table with Python source attribution — the headless
replacement for the TensorBoard profile UI that drove this framework's
update-tuning (RESULTS.md: the gather findings came from exactly this
table).
"""

from __future__ import annotations

import contextlib
import dataclasses
import glob
import gzip
import json
import re
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


@dataclasses.dataclass
class OpCost:
    """Aggregated device time for one XLA op across a trace."""
    name: str
    total_us: float
    count: int
    source: str      # Python file:line the op traces back to
    tf_op: str       # jaxpr path (jit(...)/ ... / primitive)


def summarize_trace(trace_dir: str) -> list[OpCost]:
    """Aggregate device time per HLO op from a ``jax.profiler`` trace.

    Parses the perfetto ``*.trace.json.gz`` files under ``trace_dir``,
    keeps only the device-side 'XLA Ops' track (host python frames and
    ``while`` loop wrappers — which double-count their body — are
    dropped), and returns ops sorted by total device time with source
    attribution.  Works headless: no TensorBoard needed.
    """
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            events.extend(json.load(f).get("traceEvents", []))

    device_pids, op_tracks = set(), set()
    for ev in events:
        if ev.get("ph") != "M":
            continue
        args = ev.get("args") or {}
        if (ev.get("name") == "process_name"
                and "/device:" in str(args.get("name", ""))):
            device_pids.add(ev.get("pid"))
    for ev in events:
        if ev.get("ph") != "M":
            continue
        args = ev.get("args") or {}
        if (ev.get("name") == "thread_name"
                and args.get("name") == "XLA Ops"
                and ev.get("pid") in device_pids):
            op_tracks.add((ev.get("pid"), ev.get("tid")))

    totals: dict[str, OpCost] = {}
    for ev in events:
        if (ev.get("ph") != "X"
                or (ev.get("pid"), ev.get("tid")) not in op_tracks):
            continue
        name = ev["name"]
        # Control-flow wrappers (while/conditional) report durations that
        # INCLUDE their body ops, which also appear as separate events —
        # keeping both would double-count.
        if name.startswith(("while", "conditional")):
            continue
        cost = totals.get(name)
        if cost is None:
            args = ev.get("args") or {}
            src = re.sub(r"^.*/(gymothelloenv_tpu/)", r"\1",
                         str(args.get("source", "")))
            totals[name] = OpCost(name=name, total_us=float(ev["dur"]),
                                  count=1, source=src,
                                  tf_op=str(args.get("tf_op", "")))
        else:
            cost.total_us += ev["dur"]
            cost.count += 1
    return sorted(totals.values(), key=lambda c: -c.total_us)


def format_op_table(ops: list[OpCost], top: int = 40) -> str:
    """Render ``summarize_trace`` output as an aligned text table."""
    lines = [f"leaf device total: "
             f"{sum(o.total_us for o in ops) / 1000:.1f} ms",
             f"{'ms_total':>9} {'n':>5}  {'op':24s} {'source':44s} tf_op"]
    for o in ops[:top]:
        lines.append(
            f"{o.total_us / 1000:9.3f} {o.count:5d}  {o.name[:24]:24s} "
            f"{o.source[:44]:44s} {o.tf_op[-70:]}")
    return "\n".join(lines)
