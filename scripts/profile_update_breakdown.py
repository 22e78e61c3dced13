"""Decompose the PPO update cost on-chip: forward, forward+backward,
optimizer apply, minibatch gather, and the full 4x4 epoch/minibatch update,
all under the single-dispatch scan harness (per-call tunnel dispatch would
otherwise swamp the millisecond-scale pieces).

Prints one JSON line per measurement; informs where update-side tuning
effort should go (see RESULTS.md training-throughput section).
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
    """Time REPS invocations of ``fn(x)`` inside one jitted scan (single
    dispatch + single fetch); returns seconds per invocation.  ``x`` must
    be a float array/scalar — it is perturbed by ``i * 1e-30`` per
    iteration so XLA cannot CSE the repeated calls."""
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

    float(many(x))          # compile + warm
    t0 = time.perf_counter()
    float(many(x))
    return (time.perf_counter() - t0) / REPS


def main():
    tpu.warmup()

    from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                              make_optimizer, ppo_loss,
                                              ppo_update)
    from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                     make_network)
    from gymothelloenv_tpu.core.state import EnvConfig

    env_cfg = EnvConfig()
    net = make_network(env_cfg)
    apply_fn = make_apply_fn(net)
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    ppo_cfg = PPOConfig()
    optimizer = make_optimizer(ppo_cfg)
    opt_state = optimizer.init(params)

    T = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    M = T * N // ppo_cfg.num_mini_batch     # reference minibatch size
    ks = jax.random.split(key, 8)
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

    # 1. forward only
    dt_fwd = timed(lambda o: apply_fn(params, o)[0], mb.obs)
    # 2. loss forward (incl. masked softmax etc.)
    dt_loss = timed(
        lambda o: ppo_loss(params, apply_fn,
                           mb.replace(obs=o), adv, ret, ppo_cfg, None)[0],
        mb.obs)
    # 3. forward+backward
    grad_fn = jax.grad(
        lambda p, o: ppo_loss(p, apply_fn, mb.replace(obs=o), adv, ret,
                              ppo_cfg, None)[0])
    dt_grad = timed(lambda o: grad_fn(params, o), mb.obs)
    # 4. optimizer apply alone
    grads = jax.jit(grad_fn)(params, mb.obs)

    def opt_apply(g0):
        updates, _ = optimizer.update(
            jax.tree.map(lambda g: g + g0, grads), opt_state, params)
        return updates

    dt_opt = timed(opt_apply, jnp.float32(0))

    # 5. full reference-schedule update on a (T, N) rollout
    roll = Transition(
        obs=jax.random.bernoulli(ks[5], 0.3, (T, N, 4, 8, 8)).astype(
            jnp.float32),
        action=jax.random.randint(ks[6], (T, N), 0, 64),
        logp=-jnp.ones((T, N)) * 3.0,
        value=jnp.zeros((T, N)),
        reward=jnp.zeros((T, N)),
        done=jnp.zeros((T, N), bool),
        legal=jnp.ones((T, N, 64), bool))
    boot = jnp.zeros((N,))

    def full_update(o):
        p2, _, metrics = ppo_update(params, opt_state,
                                    roll.replace(obs=o), boot,
                                    jax.random.PRNGKey(1), apply_fn,
                                    optimizer, ppo_cfg)
        return metrics["value_loss"]

    dt_full = timed(full_update, roll.obs)

    # 5b. production layout: int8 obs in the rollout (collectors store
    # {0,1} planes narrow; includes one f32->i8 cast per call, ~2 ms).
    def full_update_i8(o):
        p2, _, metrics = ppo_update(
            params, opt_state, roll.replace(obs=o.astype(jnp.int8)),
            boot, jax.random.PRNGKey(1), apply_fn, optimizer, ppo_cfg)
        return metrics["value_loss"]

    dt_full_i8 = timed(full_update_i8, roll.obs)

    # 6. minibatch gather alone (the permuted-index row gather every
    # minibatch step performs on the flat rollout)
    flat = jax.tree.map(
        lambda x: x.reshape((T * N,) + x.shape[2:]), roll)
    idx = jax.random.permutation(ks[7], T * N)[:M]

    def gather(o):
        fl = flat.replace(obs=o.reshape((T * N,) + o.shape[2:]))
        return jax.tree.map(lambda x: x[idx], fl)

    dt_gather = timed(gather, roll.obs)

    # 6b. gather lowering probes: 2-D row gather vs 4-D, int8 vs f32 —
    # pins down whether the gather is per-row-overhead- or bandwidth-bound
    # and which layout XLA lowers best.
    obs2d = flat.obs.reshape(T * N, -1)

    def g4(o):
        return o.reshape((T * N,) + o.shape[1:])[idx]

    dt_g4 = timed(g4, flat.obs)
    dt_g2 = timed(lambda o: o[idx], obs2d)
    dt_g2_int8 = timed(
        lambda o: (o.astype(jnp.int8)[idx]).astype(jnp.float32), obs2d)

    # 6c. per-epoch shuffle: jax.random.permutation of T*N indices (the
    # sort-based shuffle ppo_update runs once per epoch), data-dependent
    # seed so the scan cannot hoist it.
    def perm(o):
        seed = (o[0, 0, 0, :2] * 4.0).astype(jnp.int32).sum()
        return jax.random.permutation(
            jax.random.fold_in(jax.random.PRNGKey(3), seed), T * N)

    dt_perm = timed(perm, roll.obs)

    # 6d. GAE on the (T, N) rollout (the once-per-update scan).
    from gymothelloenv_tpu.agents.ppo import compute_gae

    def gae(o):
        r2 = roll.replace(obs=o)
        adv, ret = compute_gae(r2, boot, ppo_cfg)
        return adv.sum() + ret.sum() + o[0, 0, 0, 0]

    dt_gae = timed(gae, roll.obs)

    # 7. gather + grad (one in-update minibatch step minus optimizer)
    def gather_grad(o):
        fl = flat.replace(obs=o.reshape((T * N,) + o.shape[2:]))
        mb2 = jax.tree.map(lambda x: x[idx], fl)
        return jax.grad(
            lambda p: ppo_loss(p, apply_fn, mb2, adv, ret, ppo_cfg,
                               None)[0])(params)

    dt_gather_grad = timed(gather_grad, roll.obs)

    print(json.dumps({
        "minibatch": M,
        "fwd_ms": round(dt_fwd * 1e3, 3),
        "loss_fwd_ms": round(dt_loss * 1e3, 3),
        "grad_ms": round(dt_grad * 1e3, 3),
        "opt_apply_ms": round(dt_opt * 1e3, 3),
        "gather_ms": round(dt_gather * 1e3, 3),
        "gather4d_obs_ms": round(dt_g4 * 1e3, 3),
        "gather2d_obs_ms": round(dt_g2 * 1e3, 3),
        "gather2d_int8_obs_ms": round(dt_g2_int8 * 1e3, 3),
        "gather_grad_ms": round(dt_gather_grad * 1e3, 3),
        "perm_ms": round(dt_perm * 1e3, 3),
        "gae_ms": round(dt_gae * 1e3, 3),
        "full_update_ms": round(dt_full * 1e3, 3),
        "full_update_int8_ms": round(dt_full_i8 * 1e3, 3),
        "grad_steps_per_update": ppo_cfg.ppo_epochs
        * ppo_cfg.num_mini_batch,
    }), flush=True)


if __name__ == "__main__":
    main()
