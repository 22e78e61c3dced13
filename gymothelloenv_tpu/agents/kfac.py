"""K-FAC natural-gradient optimizer + ACKTR update — rebuild of the
vendored ``algo/kfac.py`` (:87-241) and the ``A2C_ACKTR(acktr=True)`` path.

Scope: explicit stacks of Dense layers (the vendored ACKTR's real use is
the MuJoCo/Atari MLP policies; its Othello path is dead code —
SURVEY.md §2.2).  The torch version hooks module forward/backward passes to
collect the Kronecker factors; in JAX we use an explicit functional MLP
whose forward exposes layer inputs, and obtain pre-activation gradients via
the zero-perturbation trick (grad w.r.t. an additive zero gives dL/dz).

Mechanics per Dense layer (kfac.py semantics):
  * running factors  m_aa ← ρ m_aa + (1-ρ) E[ā āᵀ]  (ā = [a, 1] bias-aug)
                     m_gg ← ρ m_gg + (1-ρ) E[g gᵀ]  (g from the sampled
                     Fisher loss, not the data loss)
  * every ``Tf`` steps: eigendecompositions of both factors
  * precondition:    Ṽ = Q_g (Q_gᵀ ∇W̄ Q_a ⊘ (d_g d_aᵀ + λ)) Q_aᵀ
  * KL trust region: scale all grads by min(1, sqrt(kl_clip / Σ Ṽ∘∇ lr²))
  * SGD with momentum on the scaled natural gradients.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.agents.ppo import Transition
from gymothelloenv_tpu.models.distributions import MaskedCategorical


# ---------------------------------------------------------------------------
# Explicit MLP actor-critic (the vendored MLPBase shape: 2x64 tanh towers,
# model.py:317-348) with KFAC-visible internals.
# ---------------------------------------------------------------------------

def mlp_stack_init(key, sizes: Sequence[int]):
    """List of {'w', 'b'} layers; orthogonal(sqrt 2) init like the
    reference MLPBase."""
    params = []
    for i, (n_in, n_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, k = jax.random.split(key)
        gain = jnp.sqrt(2.0) if i < len(sizes) - 2 else 0.01
        w = jax.nn.initializers.orthogonal(gain)(k, (n_in, n_out))
        params.append({"w": w, "b": jnp.zeros((n_out,))})
    return params


def mlp_stack_apply(params, x, perturb=None):
    """Forward; returns (out, layer_inputs).  ``perturb`` (optional list of
    zero arrays shaped like each layer's pre-activation) enables dL/dz
    extraction via jax.grad."""
    inputs = []
    h = x
    for i, layer in enumerate(params):
        inputs.append(h)
        z = h @ layer["w"] + layer["b"]
        if perturb is not None:
            z = z + perturb[i]
        h = z if i == len(params) - 1 else jnp.tanh(z)
    return h, inputs


def zero_perturb(params, batch: int):
    return [jnp.zeros((batch, layer["w"].shape[1])) for layer in params]


@dataclasses.dataclass(frozen=True)
class ACKTRConfig:
    """kfac.py:87-100 defaults."""
    lr: float = 0.25
    momentum: float = 0.9
    stat_decay: float = 0.99
    kl_clip: float = 0.001
    damping: float = 1e-2
    weight_decay: float = 0.0
    t_stat: int = 1      # Ts — Fisher-stat refresh interval
    t_inv: int = 10      # Tf — eigendecomposition refresh interval
    gamma: float = 0.99
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.01


@struct.dataclass
class KFACLayerState:
    m_aa: jnp.ndarray     # (in+1, in+1)
    m_gg: jnp.ndarray     # (out, out)
    q_a: jnp.ndarray
    d_a: jnp.ndarray
    q_g: jnp.ndarray
    d_g: jnp.ndarray
    momentum: jnp.ndarray  # (in+1, out) buffer on augmented weights


@struct.dataclass
class KFACState:
    layers: tuple
    step: jnp.ndarray


def kfac_init(params) -> KFACState:
    layers = []
    for layer in params:
        n_in, n_out = layer["w"].shape
        layers.append(KFACLayerState(
            m_aa=jnp.eye(n_in + 1), m_gg=jnp.eye(n_out),
            q_a=jnp.eye(n_in + 1), d_a=jnp.ones(n_in + 1),
            q_g=jnp.eye(n_out), d_g=jnp.ones(n_out),
            momentum=jnp.zeros((n_in + 1, n_out))))
    return KFACState(layers=tuple(layers), step=jnp.int32(0))


def _augment(a):
    return jnp.concatenate([a, jnp.ones(a.shape[:-1] + (1,))], axis=-1)


def update_fisher_stats(state: KFACState, cfg: ACKTRConfig, layer_inputs,
                        fisher_g) -> KFACState:
    """Accumulate running Kronecker factors from one Fisher sample
    (kfac.py:144-188)."""
    new_layers = []
    for ls, a, g in zip(state.layers, layer_inputs, fisher_g):
        batch = a.shape[0]
        a_aug = _augment(a)
        cov_a = a_aug.T @ a_aug / batch
        gs = g * batch                       # kfac.py grad-scale convention
        cov_g = gs.T @ gs / batch
        new_layers.append(ls.replace(
            m_aa=cfg.stat_decay * ls.m_aa + (1 - cfg.stat_decay) * cov_a,
            m_gg=cfg.stat_decay * ls.m_gg + (1 - cfg.stat_decay) * cov_g))
    return state.replace(layers=tuple(new_layers))


def refresh_eigendecomp(state: KFACState, do: jnp.ndarray) -> KFACState:
    """Recompute eigendecompositions where ``do`` (scalar bool)
    (kfac.py:205-214)."""
    new_layers = []
    for ls in state.layers:
        d_a, q_a = jnp.linalg.eigh(ls.m_aa)
        d_g, q_g = jnp.linalg.eigh(ls.m_gg)
        d_a = jnp.maximum(d_a, 0.0)
        d_g = jnp.maximum(d_g, 0.0)
        new_layers.append(ls.replace(
            q_a=jnp.where(do, q_a, ls.q_a),
            d_a=jnp.where(do, d_a, ls.d_a),
            q_g=jnp.where(do, q_g, ls.q_g),
            d_g=jnp.where(do, d_g, ls.d_g)))
    return state.replace(layers=tuple(new_layers))


def kfac_step(params, state: KFACState, cfg: ACKTRConfig, grads):
    """Precondition ``grads`` (same pytree as params), apply the KL trust
    region and a momentum-SGD step (kfac.py:216-241).
    Returns (params, state)."""
    precond = []
    for ls, layer, grad in zip(state.layers, params, grads):
        g_aug = jnp.concatenate([grad["w"], grad["b"][None, :]], axis=0)
        v1 = ls.q_g.T @ g_aug.T @ ls.q_a       # (out, in+1)
        v2 = v1 / (ls.d_g[:, None] * ls.d_a[None, :] + cfg.damping)
        nat = (ls.q_g @ v2 @ ls.q_a.T).T       # (in+1, out)
        precond.append(nat)

    # KL clip: nu = sqrt(kl_clip / sum(lr^2 * nat . grad)).
    vg = sum((nat[:-1] * grad["w"]).sum() + (nat[-1] * grad["b"]).sum()
             for nat, grad in zip(precond, grads)) * cfg.lr ** 2
    nu = jnp.minimum(1.0, jnp.sqrt(cfg.kl_clip / (jnp.abs(vg) + 1e-12)))

    new_params, new_layers = [], []
    for ls, layer, nat in zip(state.layers, params, precond):
        buf = cfg.momentum * ls.momentum + nat * nu
        w_aug = jnp.concatenate([layer["w"], layer["b"][None, :]], axis=0)
        w_aug = w_aug - cfg.lr * buf
        new_params.append({"w": w_aug[:-1], "b": w_aug[-1]})
        new_layers.append(ls.replace(momentum=buf))
    return new_params, state.replace(layers=tuple(new_layers),
                                     step=state.step + 1)


# ---------------------------------------------------------------------------
# ACKTR: A2C loss + Fisher sampling + KFAC step on an MLP actor-critic.
# ---------------------------------------------------------------------------

@struct.dataclass
class ACKTRAgent:
    actor: list
    critic: list
    kfac_actor: KFACState
    kfac_critic: KFACState


def acktr_init(key, obs_dim: int, num_actions: int,
               hidden: int = 64) -> ACKTRAgent:
    k1, k2 = jax.random.split(key)
    actor = mlp_stack_init(k1, [obs_dim, hidden, hidden, num_actions])
    critic = mlp_stack_init(k2, [obs_dim, hidden, hidden, 1])
    return ACKTRAgent(actor=actor, critic=critic,
                      kfac_actor=kfac_init(actor),
                      kfac_critic=kfac_init(critic))


def acktr_update(agent: ACKTRAgent, rollout: Transition,
                 returns: jnp.ndarray, key, cfg: ACKTRConfig):
    """One ACKTR update (a2c_acktr.py:34-76 with acktr=True):
    1. Fisher sample: actions ~ pi, values + noise; accumulate factors.
    2. A2C loss gradients, KFAC-preconditioned step for both towers.
    ``rollout.obs`` must be flat (K, obs_dim); ``returns`` (K,).
    Returns (agent, metrics)."""
    obs = rollout.obs.astype(jnp.float32)
    K = obs.shape[0]

    # --- Fisher statistics (sampled-label losses, a2c_acktr.py:53-68) ---
    def actor_fisher(pert):
        logits, _ = mlp_stack_apply(agent.actor, obs, pert)
        dist = MaskedCategorical(logits=logits, mask=rollout.legal)
        sampled = dist.sample(key)
        return -dist.log_prob(sampled).mean()

    def critic_fisher(pert):
        values, _ = mlp_stack_apply(agent.critic, obs, pert)
        noise = jax.random.normal(key, values.shape)
        target = jax.lax.stop_gradient(values + noise)
        return -cfg.value_loss_coef * ((values - target) ** 2).mean()

    do_stats = agent.kfac_actor.step % cfg.t_stat == 0
    ka = agent.kfac_actor
    kc = agent.kfac_critic
    _, a_inputs = mlp_stack_apply(agent.actor, obs)
    _, c_inputs = mlp_stack_apply(agent.critic, obs)
    g_actor = jax.grad(actor_fisher)(zero_perturb(agent.actor, K))
    g_critic = jax.grad(critic_fisher)(zero_perturb(agent.critic, K))

    ka_new = update_fisher_stats(ka, cfg, a_inputs, g_actor)
    kc_new = update_fisher_stats(kc, cfg, c_inputs, g_critic)
    ka = jax.tree.map(lambda n, o: jnp.where(do_stats, n, o), ka_new, ka)
    kc = jax.tree.map(lambda n, o: jnp.where(do_stats, n, o), kc_new, kc)

    do_inv = ka.step % cfg.t_inv == 0
    ka = refresh_eigendecomp(ka, do_inv)
    kc = refresh_eigendecomp(kc, do_inv)

    # --- A2C loss gradients -------------------------------------------
    def loss_fn(actor, critic):
        logits, _ = mlp_stack_apply(actor, obs)
        values, _ = mlp_stack_apply(critic, obs)
        values = values[:, 0]
        dist = MaskedCategorical(logits=logits, mask=rollout.legal)
        logp = dist.log_prob(rollout.action)
        adv = returns - values
        value_loss = (adv ** 2).mean()
        action_loss = -(jax.lax.stop_gradient(adv) * logp).mean()
        entropy = dist.entropy_full().mean()
        total = (value_loss * cfg.value_loss_coef + action_loss
                 - entropy * cfg.entropy_coef)
        return total, {"value_loss": value_loss,
                       "action_loss": action_loss, "entropy": entropy}

    (grads_a, grads_c), metrics = jax.grad(
        loss_fn, argnums=(0, 1), has_aux=True)(agent.actor, agent.critic)

    actor, ka = kfac_step(agent.actor, ka, cfg, grads_a)
    critic, kc = kfac_step(agent.critic, kc, cfg, grads_c)
    return ACKTRAgent(actor=actor, critic=critic, kfac_actor=ka,
                      kfac_critic=kc), metrics
