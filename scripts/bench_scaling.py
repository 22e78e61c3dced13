"""Weak-scaling benchmark for the sharded PPO train step.

Runs the full collect+update program on a 1-device mesh and on the full
mesh with the batch scaled proportionally, and reports the weak-scaling
efficiency (BASELINE target: >=90% from 1 chip to 2 hosts).  On a real pod
slice this is the headline scaling number; on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) it validates the
sharded program's mechanics rather than real bandwidth.

Usage:
    python scripts/bench_scaling.py [per-device-envs] [num-steps]
"""

import sys
import time

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.agents.ppo import PPOConfig, make_optimizer
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.parallel import make_mesh, make_sharded_train_step
from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                 make_network)
from gymothelloenv_tpu.train.self_play import selfplay_init
from gymothelloenv_tpu.utils.tpu import warmup


def measure(n_devices: int, per_device_envs: int, num_steps: int,
            reps: int = 5) -> float:
    env_cfg = EnvConfig(num_disk_as_reward=True)
    ppo_cfg = PPOConfig(num_updates=100)
    net = make_network(env_cfg)
    apply_fn = make_apply_fn(net)
    optimizer = make_optimizer(ppo_cfg)
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    opt_state = optimizer.init(params)

    mesh = make_mesh(n_devices, model_parallel=1)
    train_step, place_params, place_sp = make_sharded_train_step(
        mesh, apply_fn, optimizer, env_cfg, ppo_cfg, num_steps,
        params_example=params, donate=False, jit_wrap=False)
    num_envs = per_device_envs * n_devices
    p = place_params(params)
    o = jax.tree.map(jnp.copy, opt_state)
    sp = place_sp(selfplay_init(p, apply_fn, key, env_cfg, num_envs))

    # Time `reps` chained updates inside ONE jitted scan (re-invoking a
    # sharded jit from Python trips a jax-0.9 fast-path bug — CLAUDE.md).
    @jax.jit
    def run_many(p, o, sp, keys):
        def body(carry, k):
            p, o, sp = carry
            p, o, sp, m = train_step(p, o, sp, k)
            return (p, o, sp), m["value_loss"]
        (p, o, sp), losses = jax.lax.scan(body, (p, o, sp), keys)
        return losses.sum()

    keys1 = jax.random.split(key, 1)
    keysN = jax.random.split(key, reps)
    float(run_many(p, o, sp, keys1))             # compile (len-1 scan)
    float(run_many(p, o, sp, keysN))             # compile (len-reps scan)
    t0 = time.perf_counter()
    float(run_many(p, o, sp, keysN))
    dt = (time.perf_counter() - t0) / reps
    rate = num_envs * num_steps / dt
    print(f"{n_devices} device(s): {num_envs} envs x {num_steps} slots "
          f"-> {dt * 1e3:8.1f} ms/update, {rate / 1e3:8.1f}K "
          f"transitions/s", flush=True)
    return rate


def main():
    warmup()
    per_device = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    num_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n = len(jax.devices())
    r1 = measure(1, per_device, num_steps)
    if n == 1:
        print("single device only; scaling efficiency n/a")
        return
    rn = measure(n, per_device, num_steps)
    eff = rn / (r1 * n)
    print(f"weak-scaling efficiency 1 -> {n} devices: {eff:.1%}")


if __name__ == "__main__":
    main()
