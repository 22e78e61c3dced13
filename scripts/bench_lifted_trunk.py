"""A/B the PPO grad step and full update across ConvTrunk impls
(conv | im2col | lifted — models/nets.py), float32 and bfloat16.  Single-dispatch scan harness (see profile_update_breakdown.py).

Usage: python scripts/bench_lifted_trunk.py [T] [N]
Prints one JSON line per (trunk, dtype) combo.
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
            leaves = [jnp.sum(leaf.astype(jnp.float32))
                      for leaf in jax.tree.leaves(out)]
            return acc + sum(leaves), None
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
                                              make_optimizer, ppo_loss,
                                              ppo_update)
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                     make_network)

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    env_cfg = EnvConfig()
    ppo_cfg = PPOConfig()
    optimizer = make_optimizer(ppo_cfg)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    M = T * N // ppo_cfg.num_mini_batch

    mb = Transition(
        obs=jax.random.bernoulli(ks[0], 0.3, (M, 4, 8, 8)).astype(
            jnp.float32),
        action=jax.random.randint(ks[1], (M,), 0, 64),
        logp=-jnp.ones((M,)) * 3.0,
        value=jax.random.normal(ks[2], (M,)),
        reward=jnp.zeros((M,)),
        done=jnp.zeros((M,), bool),
        legal=jnp.ones((M, 64), bool))
    adv = jax.random.normal(ks[3], (M,))
    ret = jax.random.normal(ks[4], (M,))
    roll = Transition(
        obs=jax.random.bernoulli(ks[5], 0.3, (T, N, 4, 8, 8)).astype(
            jnp.int8),
        action=jax.random.randint(ks[6], (T, N), 0, 64),
        logp=-jnp.ones((T, N)) * 3.0,
        value=jnp.zeros((T, N)),
        reward=jnp.zeros((T, N)),
        done=jnp.zeros((T, N), bool),
        legal=jnp.ones((T, N, 64), bool))
    boot = jnp.zeros((N,))

    for impl in ("conv", "im2col", "lifted"):
        for bf16 in (False, True):
            net = make_network(env_cfg, bf16=bf16, trunk_impl=impl)
            apply_fn = make_apply_fn(net)
            params = net.init(jax.random.PRNGKey(1),
                              jnp.zeros((1, 4, 8, 8)))
            opt_state = optimizer.init(params)

            dt_fwd = timed(lambda o: apply_fn(params, o)[0], mb.obs)
            grad_fn = jax.grad(
                lambda p, o: ppo_loss(p, apply_fn, mb.replace(obs=o),
                                      adv, ret, ppo_cfg, None)[0])
            dt_grad = timed(lambda o: grad_fn(params, o), mb.obs)

            def full_update(z):
                _, _, metrics = ppo_update(
                    params, opt_state,
                    roll.replace(logp=roll.logp + z), boot,
                    jax.random.PRNGKey(2), apply_fn, optimizer, ppo_cfg)
                return metrics["value_loss"]

            dt_full = timed(full_update, jnp.float32(0))
            print(json.dumps({
                "impl": impl, "bf16": bf16, "minibatch": M,
                "fwd_ms": round(dt_fwd * 1e3, 3),
                "grad_ms": round(dt_grad * 1e3, 3),
                "full_update_ms": round(dt_full * 1e3, 3),
                "update_trans_per_s": round(T * N / dt_full),
            }), flush=True)


if __name__ == "__main__":
    main()
