"""The standalone "simple" PPO — rebuild of /root/reference/ppo.py:111-334.

Distinct from the GAE variant (agents/ppo.py): Monte-Carlo discounted
returns with NO bootstrap (zeroed at terminals and at the buffer edge,
ppo.py:179-187), whole-buffer reward normalization (ppo.py:189-190), plain
(unclipped) value MSE, entropy coef 0.01, Adam lr 1e-3, and a ``policy_old``
behaviour copy synced after each update (ppo.py:223-224).

Reference quirk reproduced on purpose: while ACTIONS are sampled from the
legal-subset renormalized probabilities (ppo.py:233-251), the stored
behaviour log-prob and the update's log-probs/entropy all use the FULL
unmasked softmax (ppo.py:98-108, :309-310) — the update never sees the
legal mask.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from gymothelloenv_tpu.agents.ppo import Transition
from gymothelloenv_tpu.ops.gather import pack_rows


@dataclasses.dataclass(frozen=True)
class SimplePPOConfig:
    """Defaults from PPO.__init__ (ppo.py:112-139)."""
    lr: float = 1e-3
    betas: tuple = (0.9, 0.999)
    gamma: float = 0.99
    k_epochs: int = 5
    eps_clip: float = 0.2
    update_timestep: int = 2048   # reference 2000; rounded to T*N tiles
    batch_size: int = 256
    value_coef: float = 0.5
    entropy_coef: float = 0.01


def make_simple_ppo_optimizer(cfg: SimplePPOConfig):
    return optax.adam(cfg.lr, b1=cfg.betas[0], b2=cfg.betas[1])


def mc_returns(rewards: jnp.ndarray, dones: jnp.ndarray,
               gamma: float) -> jnp.ndarray:
    """Reversed discounted sums, reset at terminals, zero "bootstrap" at the
    buffer edge (ppo.py:179-187).  Shapes (T, N) -> (T, N)."""
    def body(acc, inp):
        r, d = inp
        acc = r + gamma * acc * (1.0 - d.astype(jnp.float32))
        return acc, acc

    _, ret = jax.lax.scan(body, jnp.zeros_like(rewards[0]),
                          (rewards, dones), reverse=True)
    return ret


def simple_ppo_update(params, opt_state, rollout: Transition,
                      key, apply_fn, optimizer, cfg: SimplePPOConfig):
    """K-epoch shuffled-minibatch update (ppo.py:178-227).

    ``rollout.logp`` must hold FULL-softmax behaviour log-probs recorded at
    collection time (the reference's ``policy_old`` — since collection
    always runs on the post-update weights, storing log-probs at sample
    time is equivalent to keeping a separate old-policy copy).
    Returns (params, opt_state, avg_loss)."""
    returns = mc_returns(rollout.reward, rollout.done, cfg.gamma)
    returns = (returns - returns.mean()) / (returns.std() + 1e-5)

    T, N = rollout.reward.shape
    total = T * N
    flat = jax.tree.map(lambda x: x.reshape((total,) + x.shape[2:]),
                        rollout)
    flat_ret = returns.reshape(-1)
    mb_size = min(cfg.batch_size, total)
    num_batches = max(1, total // mb_size)

    # One row gather per minibatch instead of per-leaf gathers (the same
    # fixed per-gather cost that dominated agents/ppo.py — see
    # ops/gather.pack_rows).
    packed, unpack = pack_rows({"obs": flat.obs, "action": flat.action,
                                "logp": flat.logp, "ret": flat_ret})

    def loss_fn(params, mb):
        logits, values, _ = apply_fn(params, mb["obs"].astype(jnp.float32))
        logp_all = jax.nn.log_softmax(logits, axis=-1)
        # One-hot select (exact) — per-row gathers carry a large fixed
        # cost on TPU (see MaskedCategorical.log_prob).
        onehot = mb["action"][:, None] == jnp.arange(
            logits.shape[-1], dtype=jnp.int32)
        logp = jnp.where(onehot, logp_all, 0.0).sum(-1)
        mb_ret = mb["ret"]
        ratio = jnp.exp(logp - mb["logp"])
        adv = mb_ret - jax.lax.stop_gradient(values)
        surr1 = ratio * adv
        surr2 = jnp.clip(ratio, 1 - cfg.eps_clip, 1 + cfg.eps_clip) * adv
        entropy = -(jnp.exp(logp_all) * logp_all).sum(-1)
        loss = (-jnp.minimum(surr1, surr2)
                + cfg.value_coef * (values - mb_ret) ** 2
                - cfg.entropy_coef * entropy)
        return loss.mean()

    def epoch(carry, ek):
        params, opt_state = carry
        perm = jax.random.permutation(ek, total)

        def minibatch(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(
                perm, i * mb_size, mb_size)
            mb = unpack(packed[idx])
            loss, grads = jax.value_and_grad(loss_fn)(params, mb)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            minibatch, (params, opt_state), jnp.arange(num_batches))
        return (params, opt_state), losses.mean()

    (params, opt_state), losses = jax.lax.scan(
        epoch, (params, opt_state), jax.random.split(key, cfg.k_epochs))
    return params, opt_state, losses.mean()
