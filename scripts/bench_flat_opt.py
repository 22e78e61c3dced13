"""A/B PPOConfig.flatten_optimizer (optax.flatten around clip+adam): does
collapsing the optimizer state to single vectors shrink the minibatch
scan's carry cost?  Single-dispatch scan harness.

Usage: python scripts/bench_flat_opt.py [T] [N] [--f32]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.utils import tpu

REPS = 32


def timed(fn, x):
    @jax.jit
    def many(x):
        def body(acc, i):
            out = fn(x + i.astype(x.dtype) * x.dtype.type(1e-30))
            return acc + jnp.sum(out.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(REPS, dtype=jnp.float32))
        return acc

    float(many(x))
    t0 = time.perf_counter()
    float(many(x))
    return (time.perf_counter() - t0) / REPS


def main():
    tpu.warmup()
    from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                              make_optimizer, ppo_update)
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                     make_network)

    argv = sys.argv[1:]
    bf16 = "--f32" not in argv
    pos = [a for a in argv if not a.startswith("--")]
    T = int(pos[0]) if pos else 64
    N = int(pos[1]) if len(pos) > 1 else 4096

    env_cfg = EnvConfig()
    net = make_network(env_cfg, bf16=bf16)
    apply_fn = make_apply_fn(net)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 8)))
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

    for flat in (False, True):
        cfg = PPOConfig(flatten_optimizer=flat)
        optimizer = make_optimizer(cfg)
        opt_state = optimizer.init(params)

        def full_update(z):
            _, _, metrics = ppo_update(
                params, opt_state, roll.replace(logp=roll.logp + z), boot,
                jax.random.PRNGKey(2), apply_fn, optimizer, cfg)
            return metrics["value_loss"]

        dt = timed(full_update, jnp.float32(0))
        print(json.dumps({"flatten_optimizer": flat, "bf16": bf16,
                          "full_update_ms": round(dt * 1e3, 3),
                          "update_trans_per_s": round(T * N / dt)}),
              flush=True)


if __name__ == "__main__":
    main()
