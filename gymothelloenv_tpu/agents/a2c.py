"""A2C — rebuild of the vendored ``algo/a2c_acktr.py`` (A2C_ACKTR, :8-80).

One full-batch actor-critic gradient step per rollout (no epochs/minibatch):
``value_loss * coef + policy_gradient_loss - entropy * coef`` with RMSprop
(lr 7e-4, eps 1e-5, alpha 0.99 — arguments.py defaults) and grad-norm
clipping.

NOTE(parity): the reference's A2C calls ``evaluate_actions`` without the
``choices`` argument (a2c_acktr.py:38-43), which is incompatible with the
masked Policy — a dead code path in the snapshot (SURVEY.md §2.2).  This
implementation is the working masked equivalent.  The KFAC/ACKTR natural-
gradient preconditioner (algo/kfac.py) is tracked separately
(COMPONENTS.md).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from gymothelloenv_tpu.agents.ppo import PPOConfig, Transition, compute_gae
from gymothelloenv_tpu.models.distributions import MaskedCategorical


@dataclasses.dataclass(frozen=True)
class A2CConfig:
    """arguments.py defaults used by the A2C branch."""
    lr: float = 7e-4
    rms_eps: float = 1e-5
    rms_alpha: float = 0.99
    gamma: float = 0.99
    use_gae: bool = False
    gae_lambda: float = 0.95
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.01
    max_grad_norm: float = 0.5


def make_a2c_optimizer(cfg: A2CConfig):
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.rmsprop(cfg.lr, decay=cfg.rms_alpha, eps=cfg.rms_eps))


def a2c_returns(rollout: Transition, bootstrap_value: jnp.ndarray,
                cfg: A2CConfig) -> jnp.ndarray:
    """storage.compute_returns without GAE (storage.py:107-112): bootstrapped
    discounted returns with episode-boundary masks."""
    if cfg.use_gae:
        gcfg = PPOConfig(gamma=cfg.gamma, gae_lambda=cfg.gae_lambda)
        adv, returns = compute_gae(rollout, bootstrap_value, gcfg)
        return returns

    def body(ret, inp):
        r, d = inp
        ret = r + cfg.gamma * ret * (1.0 - d.astype(jnp.float32))
        return ret, ret

    _, returns = jax.lax.scan(body, bootstrap_value,
                              (rollout.reward, rollout.done), reverse=True)
    return returns


def a2c_update(params, opt_state, rollout: Transition,
               bootstrap_value: jnp.ndarray, apply_fn: Callable,
               optimizer, cfg: A2CConfig):
    """Single-batch update (a2c_acktr.py:34-76).  Returns
    (params, opt_state, metrics)."""
    returns = a2c_returns(rollout, bootstrap_value, cfg)
    T, N = rollout.reward.shape
    flat = jax.tree.map(lambda x: x.reshape((T * N,) + x.shape[2:]),
                        rollout)
    flat_ret = returns.reshape(-1)

    def loss_fn(params):
        logits, values, _ = apply_fn(params, flat.obs.astype(jnp.float32))
        dist = MaskedCategorical(logits=logits, mask=flat.legal)
        logp = dist.log_prob(flat.action)
        adv = flat_ret - values
        value_loss = (adv ** 2).mean()
        action_loss = -(jax.lax.stop_gradient(adv) * logp).mean()
        entropy = dist.entropy_full().mean()
        total = (value_loss * cfg.value_loss_coef + action_loss
                 - entropy * cfg.entropy_coef)
        return total, {"value_loss": value_loss,
                       "action_loss": action_loss, "entropy": entropy}

    grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, metrics
