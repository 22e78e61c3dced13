"""Where does the PPO self-play train step spend its time on-chip?

Times, per configuration: the full jitted train step (collect+update),
collector-only, and update-only programs.  Prints one JSON line per
measurement.  Used to direct the training-throughput work (CLAUDE.md
round-1 notes); not part of the driver bench protocol.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

from gymothelloenv_tpu.utils import tpu


def time_calls(fn, n, sync):
    fn_out = fn()          # warmup/compile
    sync(fn_out)
    fn_out = fn()
    sync(fn_out)
    t0 = time.perf_counter()
    for _ in range(n):
        fn_out = fn()
        sync(fn_out)
    return (time.perf_counter() - t0) / n


def main():
    tpu.warmup()

    from gymothelloenv_tpu.agents.ppo import ppo_update
    from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                     SelfPlayConfig)
    from gymothelloenv_tpu.train.self_play import collect_rollout

    from gymothelloenv_tpu.train.self_play import selfplay_init

    for num_envs in (256, 1024, 4096):
        run_cfg = SelfPlayConfig(num_envs=num_envs)
        tr = PPOSelfPlayTrainer(run_cfg=run_cfg)
        tr.ensure_initialized()
        T, N = run_cfg.num_steps, run_cfg.num_envs

        params, opt_state, sp0 = tr.params, tr.opt_state, tr.sp_state

        # --- collector A/B: bit engine (default) vs forced plane engine
        dt_ab = {}
        for force_plane in (False, True):
            sp_fp = jax.jit(
                selfplay_init,
                static_argnames=("apply_fn", "cfg", "num_envs",
                                 "init_rand_steps", "logp_mode",
                                 "force_plane"))(
                params, apply_fn=tr.apply_fn, key=jax.random.PRNGKey(7),
                cfg=tr.env_cfg, num_envs=N, force_plane=force_plane)
            collect = jax.jit(
                lambda p, sp, fp=force_plane: collect_rollout(
                    p, tr.apply_fn, sp, tr.env_cfg, T,
                    run_cfg.init_rand_steps, force_plane=fp))

            def run_collect():
                sp, rollout, boot = collect(params, sp_fp)
                return rollout.reward

            dt_ab[force_plane] = time_calls(
                run_collect, 5, lambda x: np.asarray(x[0, 0]))
        dt_collect = dt_ab[False]

        sp, rollout, boot = collect(params, sp_fp)

        key = jax.random.PRNGKey(1)

        update = jax.jit(
            lambda p, o, r, b, k: ppo_update(p, o, r, b, k, tr.apply_fn,
                                             tr.optimizer, tr.ppo_cfg))

        def run_update():
            _, _, metrics = update(params, opt_state, rollout, boot, key)
            return metrics["value_loss"]

        dt_update = time_calls(run_update, 5, lambda x: float(x))

        # --- full step via the trainer's own jit (donating): time a fresh
        # trainer's train() loop end to end, fp32 and bf16 nets.
        dt_fulls = {}
        for bf16 in (False, True):
            tr2 = PPOSelfPlayTrainer(run_cfg=SelfPlayConfig(
                num_envs=num_envs, test_interval=10**9,
                save_interval=10**9, bf16=bf16))
            tr2.ensure_initialized()
            tr2.train(2, log_every=10**9)   # compile + warm
            t0 = time.perf_counter()
            iters = 5
            tr2.train(iters, log_every=10**9)
            # sync by fetching a param leaf
            np.asarray(jax.tree.leaves(tr2.params)[0])[0]
            dt_fulls[bf16] = (time.perf_counter() - t0) / iters
        dt_full = dt_fulls[False]

        steps = T * N
        print(json.dumps({
            "num_envs": num_envs,
            "collect_bit_s": round(dt_ab[False], 5),
            "collect_plane_s": round(dt_ab[True], 5),
            "update_s": round(dt_update, 5),
            "full_s": round(dt_full, 5),
            "full_bf16_s": round(dt_fulls[True], 5),
            "collect_steps_per_s": round(steps / dt_collect),
            "full_steps_per_s": round(steps / dt_full),
            "full_bf16_steps_per_s": round(steps / dt_fulls[True]),
        }), flush=True)


if __name__ == "__main__":
    main()
