"""Full PPO train-step throughput vs game-batch size (VERDICT item 5).

The update's 16 sequential minibatch grad steps are the measured floor at
N=4096 (DESIGN.md §7); the tiny CNN underutilizes the MXU at 16K-row
minibatches, so throughput should rise sublinearly-in-cost as N doubles.
Prints one JSON line per configuration:

    {"num_envs": N, "ms_per_step": ..., "trans_per_sec": ...}

Usage: python scripts/bench_batch_scaling.py [--f32] [--epochs=K]
       [--mini-batch=M] [N ...]

Measured 2026-08-20 (RESULTS.md): throughput FALLS with N (4096: 60 ms =
4.35M trans/s; 8192: 144 ms; 32768: 649 ms) — the update is already near
compute-bound, so --epochs/--mini-batch (the PPO data-reuse schedule) is
the remaining config lever, not batch size.
"""

from __future__ import annotations

import json
import sys
import time

import jax

from gymothelloenv_tpu.utils import tpu


def main():
    tpu.warmup()
    from gymothelloenv_tpu.agents.ppo import PPOConfig
    from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                     SelfPlayConfig)

    argv = sys.argv[1:]
    bf16 = "--f32" not in argv
    epochs = int(next((a.split("=", 1)[1] for a in argv
                       if a.startswith("--epochs=")), 4))
    mini_batch = int(next((a.split("=", 1)[1] for a in argv
                           if a.startswith("--mini-batch=")), 4))
    sizes = [int(a) for a in argv if not a.startswith("--")] or \
        [4096, 8192, 16384]

    for num_envs in sizes:
        run_cfg = SelfPlayConfig(num_envs=num_envs, bf16=bf16)
        tr = PPOSelfPlayTrainer(ppo_cfg=PPOConfig(num_updates=10_000,
                                                  ppo_epochs=epochs,
                                                  num_mini_batch=mini_batch),
                                run_cfg=run_cfg, log_fn=lambda *a: None)
        tr.ensure_initialized()
        key = jax.random.PRNGKey(0)

        def step():
            nonlocal key
            key, k = jax.random.split(key)
            tr.params, tr.opt_state, tr.sp_state, metrics = \
                tr._train_step(tr.params, tr.opt_state, tr.sp_state, k)
            return metrics

        m = step()                      # compile
        _ = float(m["value_loss"])      # sync (block_until_ready no-op)
        m = step()
        _ = float(m["value_loss"])
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            m = step()
        _ = float(m["value_loss"])
        dt = (time.perf_counter() - t0) / reps
        trans = run_cfg.num_steps * num_envs
        print(json.dumps({
            "num_envs": num_envs, "bf16": bf16,
            "epochs": epochs, "mini_batch": mini_batch,
            "ms_per_step": round(dt * 1e3, 2),
            "trans_per_sec": round(trans / dt),
        }), flush=True)


if __name__ == "__main__":
    main()
