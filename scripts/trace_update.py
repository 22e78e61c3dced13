"""Capture a jax.profiler device trace of the full PPO update and print the
op-level time breakdown (top XLA ops by total device time).

The tunnel backend has no TensorBoard; this parses the perfetto
trace.json.gz the profiler writes and aggregates durations by op name, so
update-tuning decisions are driven by measured HLO costs, not guesses.

Usage: python scripts/trace_update.py [T] [N] [--bf16] [--lifted]
"""

from __future__ import annotations

import glob
import gzip
import json
import re
import sys
import tempfile

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.utils import tpu


def capture(fn, args, trace_dir):
    out = jax.jit(fn)(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(jax.tree.leaves(out)[0].sum().astype(jnp.float32))  # real sync
    with jax.profiler.trace(trace_dir):
        out = jax.jit(fn)(*args)
        float(jax.tree.leaves(out)[0].sum().astype(jnp.float32))


def summarize(trace_dir, top=45):
    """Aggregate device time per HLO op from the 'XLA Ops' trace track,
    with each op's Python source attribution — the data that drives
    update-tuning decisions (per-op costs, not guesses)."""
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace files found under", trace_dir)
        return
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))

    # Identify the device-side 'XLA Ops' tracks from track metadata.
    op_tracks = set()
    device_pids = set()
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

    totals, counts, sources = {}, {}, {}
    for ev in events:
        if (ev.get("ph") != "X"
                or (ev.get("pid"), ev.get("tid")) not in op_tracks):
            continue
        name = ev["name"]
        if name.startswith("while"):
            continue  # loop wrappers double-count their body ops
        totals[name] = totals.get(name, 0) + ev["dur"]
        counts[name] = counts.get(name, 0) + 1
        if name not in sources:
            args = ev.get("args") or {}
            src = str(args.get("source", ""))
            src = re.sub(r"^/root/repo/", "", src)
            tf_op = str(args.get("tf_op", ""))
            sources[name] = (src[:48], tf_op[-70:])
    rows = sorted(totals.items(), key=lambda kv: -kv[1])
    print(f"leaf device total: {sum(totals.values()) / 1000:.1f} ms")
    print(f"{'ms_total':>9} {'n':>5}  {'op':24s} {'source':48s} tf_op")
    for name, us in rows[:top]:
        src, tf_op = sources[name]
        print(f"{us / 1000:9.3f} {counts[name]:5d}  {name[:24]:24s} "
              f"{src:48s} {tf_op}")


def main():
    tpu.warmup()
    from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                              make_optimizer, ppo_update)
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                     make_network)

    argv = [a for a in sys.argv[1:]]
    bf16 = "--bf16" in argv
    lifted = "--lifted" in argv
    pos = [a for a in argv if not a.startswith("--")]
    T = int(pos[0]) if pos else 64
    N = int(pos[1]) if len(pos) > 1 else 4096

    env_cfg = EnvConfig()
    ppo_cfg = PPOConfig()
    optimizer = make_optimizer(ppo_cfg)
    net = make_network(env_cfg, bf16=bf16, lifted=lifted)
    apply_fn = make_apply_fn(net)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 8)))
    opt_state = optimizer.init(params)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    roll = Transition(
        obs=jax.random.bernoulli(ks[0], 0.3, (T, N, 4, 8, 8)).astype(
            jnp.int8),
        action=jax.random.randint(ks[1], (T, N), 0, 64),
        logp=-jnp.ones((T, N)) * 3.0,
        value=jnp.zeros((T, N)),
        reward=jnp.zeros((T, N)),
        done=jnp.zeros((T, N), bool),
        legal=jnp.ones((T, N, 64), bool))
    boot = jnp.zeros((N,))

    def full_update(roll):
        p2, _, metrics = ppo_update(params, opt_state, roll, boot,
                                    jax.random.PRNGKey(2), apply_fn,
                                    optimizer, ppo_cfg)
        return metrics["value_loss"]

    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_")
    capture(full_update, (roll,), trace_dir)
    print("trace dir:", trace_dir, flush=True)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
