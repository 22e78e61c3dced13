"""Recurrent-PPO throughput breakdown on-chip (VERDICT r2 item 5).

Times, per (T, N, num_mini_batch) configuration: the recurrent
collector alone, the recurrent update with the round-2 monolithic
whole-net-in-scan replay, and the round-3 split (batched-trunk) replay
— plus the implied full-step transitions/s for each.  One JSON line per
measurement.

Usage: python scripts/profile_recurrent.py [T] [N]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import numpy as np

from gymothelloenv_tpu.utils import tpu


def time_calls(fn, n, sync):
    out = fn()
    sync(out)
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
        sync(out)
    return (time.perf_counter() - t0) / n


def main():
    tpu.warmup()

    from gymothelloenv_tpu.agents.ppo import (PPOConfig, make_optimizer,
                                              ppo_update_recurrent)
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.ppo_trainer import (
        make_apply_fn_recurrent, make_network, make_split_fns)
    from gymothelloenv_tpu.train.self_play import (
        collect_rollout_recurrent, selfplay_init_recurrent)

    pos = [a for a in sys.argv[1:] if not a.startswith("--")]
    T = int(pos[0]) if pos else 32
    N = int(pos[1]) if len(pos) > 1 else 1024
    H = 512

    env_cfg = EnvConfig(num_disk_as_reward=True)
    net = make_network(env_cfg, recurrent=True, hidden_size=H)
    apply_fn = make_apply_fn_recurrent(net)
    split_fns = make_split_fns(net)
    import jax.numpy as jnp
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)),
                      jnp.zeros((1, H)), jnp.ones((1,)))

    sp = jax.jit(selfplay_init_recurrent,
                 static_argnames=("apply_fn", "cfg", "num_envs",
                                  "hidden_size"))(
        params, apply_fn=apply_fn, key=jax.random.PRNGKey(1),
        cfg=env_cfg, num_envs=N, hidden_size=H)

    collect = jax.jit(lambda p, s: collect_rollout_recurrent(
        p, apply_fn, s, env_cfg, T))
    dt_collect = time_calls(lambda: collect(params, sp), 5,
                            lambda o: np.asarray(o[1].reward[0, 0]))
    print(json.dumps({"what": "collect_recurrent", "T": T, "N": N,
                      "sec": round(dt_collect, 4),
                      "trans_per_sec": round(T * N / dt_collect)}),
          flush=True)

    _, rollout, h0, masks, boot = collect(params, sp)

    for mb in (4, 2, 1):
        cfg = PPOConfig(num_mini_batch=mb, num_updates=10)
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(params)
        for name, sf in (("monolithic", None), ("split", split_fns)):
            upd = jax.jit(lambda p, o, k, sf=sf, cfg=cfg,
                          opt=optimizer: ppo_update_recurrent(
                p, o, rollout, h0, masks, boot, k, apply_fn, opt, cfg,
                split_fns=sf))
            dt = time_calls(
                lambda: upd(params, opt_state, jax.random.PRNGKey(2)),
                5, lambda o: float(o[2]["value_loss"]))
            full = dt + dt_collect
            print(json.dumps({
                "what": f"update_recurrent_{name}", "T": T, "N": N,
                "mini_batch": mb, "sec": round(dt, 4),
                "full_step_sec": round(full, 4),
                "full_step_trans_per_sec": round(T * N / full)}),
                flush=True)


if __name__ == "__main__":
    main()
