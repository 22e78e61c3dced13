"""Device-trace the PPO self-play COLLECTION phase (collect_rollout) and
print the per-HLO cost table + wall timings.

VERDICT round-1 item 5: at N=4096 collection (~43.6 ms) now rivals the
bf16 update (~46 ms); this script measures where those milliseconds live
(net forwards in advance_opponent / protagonist_act, engine plies, the
while_loop overhead) so the optimization is driven by HLO costs.

Usage: python scripts/trace_collect.py [T] [N] [--bf16]
       [--lookahead] [--tau=0.0] [--width-mult=1] [--hidden=512]

--lookahead traces the VARIANT-B collection chunk (round-5 VERDICT item
5: the search-bootstrapped collector ran at 330K trans/s with zero
trace-driven attention; round-5 compacts the child expansion to legal
moves only — this script measures before/after).
"""

from __future__ import annotations

import sys
import tempfile
import time

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.utils import tpu
from gymothelloenv_tpu.utils.profiling import (format_op_table,
                                               summarize_trace)


def main():
    tpu.warmup()
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                     make_network)
    from gymothelloenv_tpu.train.self_play import (collect_rollout,
                                                   make_lookahead_override,
                                                   selfplay_init)

    argv = sys.argv[1:]
    bf16 = "--bf16" in argv
    lookahead = "--lookahead" in argv
    tau = next((float(a.split("=")[1]) for a in argv
                if a.startswith("--tau=")), 0.0)
    k_la = next((int(a.split("=")[1]) for a in argv
                 if a.startswith("--k=")), 0)
    if k_la:
        # A/B the compaction width (--k=64 ~ the pre-round-5 full
        # expansion, modulo the cheap compaction bookkeeping).
        from gymothelloenv_tpu.train import self_play as _sp
        _sp.LOOKAHEAD_K = k_la
    width_mult = next((int(a.split("=")[1]) for a in argv
                       if a.startswith("--width-mult=")), 1)
    hidden = next((int(a.split("=")[1]) for a in argv
                   if a.startswith("--hidden=")), 512)
    pos = [a for a in argv if not a.startswith("--")]
    T = int(pos[0]) if pos else 64
    N = int(pos[1]) if len(pos) > 1 else 4096

    env_cfg = EnvConfig(num_disk_as_reward=True)
    net = make_network(env_cfg, bf16=bf16, width_mult=width_mult,
                       hidden_size=hidden)
    apply_fn = make_apply_fn(net)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 8)))
    override = (make_lookahead_override(env_cfg, tau) if lookahead
                else None)

    sp = jax.jit(selfplay_init,
                 static_argnames=("apply_fn", "cfg", "num_envs",
                                  "init_rand_steps", "act_override"))(
        params, apply_fn=apply_fn, key=jax.random.PRNGKey(0),
        cfg=env_cfg, num_envs=N, act_override=override)

    def collect(params, sp):
        sp, rollout, boot = collect_rollout(params, apply_fn, sp,
                                            env_cfg, T,
                                            act_override=override)
        return sp, rollout.reward.sum() + boot.sum()

    jitted = jax.jit(collect, donate_argnums=(1,))
    sp, s = jitted(params, sp)
    _ = float(s)                          # sync (block_until_ready no-op)

    # Wall-clock over a few chained runs.
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        sp, s = jitted(params, sp)
    _ = float(s)
    dt = (time.time() - t0) / reps
    print(f"collect T={T} N={N} bf16={bf16} lookahead={lookahead} "
          f"tau={tau} wm={width_mult} k={k_la or 'dflt'}: {dt * 1e3:.1f} ms/rollout = "
          f"{T * N / dt / 1e6:.2f}M trans/s", flush=True)

    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_collect_")
    with jax.profiler.trace(trace_dir):
        sp, s = jitted(params, sp)
        _ = float(s)
    print(format_op_table(summarize_trace(trace_dir), top=40))


if __name__ == "__main__":
    main()
