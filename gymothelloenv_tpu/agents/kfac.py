"""K-FAC natural-gradient optimizer + ACKTR update — rebuild of the
vendored ``algo/kfac.py`` (:87-241) and the ``A2C_ACKTR(acktr=True)`` path.

Scope: explicit stacks of Dense AND Conv2d layers — the two module types
the vendored KFAC supports (kfac.py:16-35 ``_extract_patches`` +
``Conv2d`` branches).  Conv layers use the KFC patch-row construction, so
both the MuJoCo/Atari MLP policies (the vendored ACKTR's real use) and a
CNNBase-shaped conv actor-critic (the Othello path that is dead code in
the reference, SURVEY.md §2.2) train here.  The torch version hooks module
forward/backward passes to
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


# ---------------------------------------------------------------------------
# Spec-based stacks: Dense + Conv layers with KFAC-visible internals.
#
# Conv layers use the KFC construction (Grosse & Martens; what the vendored
# kfac.py's ``ComputeCovA/ComputeCovG`` Conv2d branches implement via
# ``_extract_patches``, kfac.py:16-35): the layer's Kronecker "input" is the
# im2col patch matrix (B*S, kh*kw*cin) and its "output gradient" the
# pre-activation gradient rows (B*S, cout), so every conv is exactly a Dense
# layer over patch rows and the factor/eigendecomp/preconditioning code
# above applies unchanged.  Weights are stored 2-D ``(kh*kw*cin, cout)``.
# ---------------------------------------------------------------------------

_ACTS = {"tanh": jnp.tanh, "relu": jax.nn.relu, "none": lambda x: x}


@dataclasses.dataclass(frozen=True)
class DenseSpec:
    n_in: int
    n_out: int
    act: str = "tanh"
    gain: float = 1.4142135623730951  # sqrt(2)


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """NCHW conv; spatial dims are static so patch shapes stay fixed."""
    h: int
    w: int
    c_in: int
    c_out: int
    kernel: int
    stride: int = 1
    pad: int = 0
    act: str = "relu"
    gain: float = 1.4142135623730951

    @property
    def h_out(self) -> int:
        return (self.h + 2 * self.pad - self.kernel) // self.stride + 1

    @property
    def w_out(self) -> int:
        return (self.w + 2 * self.pad - self.kernel) // self.stride + 1


def stack_init(key, specs):
    """{'w', 'b'} per layer; conv weights 2-D (kh*kw*cin, cout)."""
    params = []
    for spec in specs:
        key, k = jax.random.split(key)
        if isinstance(spec, ConvSpec):
            shape = (spec.kernel * spec.kernel * spec.c_in, spec.c_out)
        else:
            shape = (spec.n_in, spec.n_out)
        w = jax.nn.initializers.orthogonal(spec.gain)(k, shape)
        params.append({"w": w, "b": jnp.zeros((shape[1],))})
    return params


def _patch_rows(spec: ConvSpec, x: jnp.ndarray) -> jnp.ndarray:
    """im2col: (B, C, H, W) -> (B*h_out*w_out, k*k*C) patch rows."""
    patches = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(spec.kernel, spec.kernel),
        window_strides=(spec.stride, spec.stride),
        padding=[(spec.pad, spec.pad)] * 2,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    # (B, C*k*k, h', w') -> rows (B*h'*w', C*k*k)
    return patches.transpose(0, 2, 3, 1).reshape(-1, patches.shape[1])


def stack_apply(params, specs, x, perturb=None):
    """Generalized ``mlp_stack_apply``: runs the spec'd stack and returns
    (out, layer_inputs) where ``layer_inputs[i]`` is the 2-D KFAC input-row
    matrix of layer i (dense: activations; conv: im2col patch rows).
    ``perturb`` entries are zero arrays shaped like the 2-D pre-activation
    rows — grad w.r.t. them yields the per-row dL/dz the Fisher factors
    need.  A Dense after a Conv auto-flattens (B, c*h'*w')."""
    inputs = []
    h = x
    for i, (spec, layer) in enumerate(zip(specs, params)):
        if isinstance(spec, ConvSpec):
            rows = _patch_rows(spec, h)
        else:
            if h.ndim > 2:
                h = h.reshape(h.shape[0], -1)
            rows = h
        inputs.append(rows)
        z = rows @ layer["w"] + layer["b"]
        if perturb is not None:
            z = z + perturb[i]
        z = _ACTS[spec.act](z)
        if isinstance(spec, ConvSpec):
            b = h.shape[0]
            z = z.reshape(b, spec.h_out, spec.w_out,
                          spec.c_out).transpose(0, 3, 1, 2)
        h = z
    return h, inputs


def stack_zero_perturb(params, specs, batch: int):
    out = []
    for spec, layer in zip(specs, params):
        rows = (batch * spec.h_out * spec.w_out
                if isinstance(spec, ConvSpec) else batch)
        out.append(jnp.zeros((rows, layer["w"].shape[1])))
    return out


def mlp_specs(sizes: Sequence[int]):
    """Specs matching ``mlp_stack_init``/``mlp_stack_apply`` exactly
    (tanh hidden, linear last, sqrt(2)/0.01 gains)."""
    specs = []
    for i, (n_in, n_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        last = i == len(sizes) - 2
        specs.append(DenseSpec(n_in, n_out, act="none" if last else "tanh",
                               gain=0.01 if last else 1.4142135623730951))
    return tuple(specs)


def conv_trunk_specs(board_size: int, in_planes: int = 4):
    """The vendored CNNBase trunk (model.py:295-300): conv(32,k3,s2,p1) →
    conv(64,k2) → conv(64,k2) → fc 512, all ReLU."""
    c1 = ConvSpec(board_size, board_size, in_planes, 32, kernel=3,
                  stride=2, pad=1)
    c2 = ConvSpec(c1.h_out, c1.w_out, 32, 64, kernel=2)
    c3 = ConvSpec(c2.h_out, c2.w_out, 64, 64, kernel=2)
    flat = 64 * c3.h_out * c3.w_out
    return (c1, c2, c3, DenseSpec(flat, 512, act="relu"))


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
    # Static layer specs (None → plain Dense/tanh semantics of the original
    # MLP path, reconstructed in acktr_update for old callers).
    actor_specs: tuple = struct.field(pytree_node=False, default=None)
    critic_specs: tuple = struct.field(pytree_node=False, default=None)


def acktr_init(key, obs_dim: int, num_actions: int,
               hidden: int = 64) -> ACKTRAgent:
    k1, k2 = jax.random.split(key)
    actor = mlp_stack_init(k1, [obs_dim, hidden, hidden, num_actions])
    critic = mlp_stack_init(k2, [obs_dim, hidden, hidden, 1])
    return ACKTRAgent(actor=actor, critic=critic,
                      kfac_actor=kfac_init(actor),
                      kfac_critic=kfac_init(critic),
                      actor_specs=mlp_specs([obs_dim, hidden, hidden,
                                             num_actions]),
                      critic_specs=mlp_specs([obs_dim, hidden, hidden, 1]))


def acktr_conv_init(key, board_size: int, num_actions: int,
                    in_planes: int = 4) -> ACKTRAgent:
    """Conv actor-critic (two CNNBase-shaped towers, model.py:295-304)
    with KFC conv factors — the configuration the vendored ACKTR could
    never reach on Othello (its masked-model signature mismatch,
    a2c_acktr.py:38-43)."""
    trunk = conv_trunk_specs(board_size, in_planes)
    a_specs = trunk + (DenseSpec(512, num_actions, act="none", gain=0.01),)
    c_specs = trunk + (DenseSpec(512, 1, act="none", gain=1.0),)
    k1, k2 = jax.random.split(key)
    actor = stack_init(k1, a_specs)
    critic = stack_init(k2, c_specs)
    return ACKTRAgent(actor=actor, critic=critic,
                      kfac_actor=kfac_init(actor),
                      kfac_critic=kfac_init(critic),
                      actor_specs=a_specs, critic_specs=c_specs)


def acktr_update(agent: ACKTRAgent, rollout: Transition,
                 returns: jnp.ndarray, key, cfg: ACKTRConfig):
    """One ACKTR update (a2c_acktr.py:34-76 with acktr=True):
    1. Fisher sample: actions ~ pi, values + noise; accumulate factors.
    2. A2C loss gradients, KFAC-preconditioned step for both towers.
    ``rollout.obs``: flat (K, obs_dim) for MLP agents, (K, C, B, B) planes
    for conv agents (``acktr_conv_init``); ``returns`` (K,).
    Returns (agent, metrics)."""
    obs = rollout.obs.astype(jnp.float32)
    K = obs.shape[0]
    a_specs = agent.actor_specs or mlp_specs(
        [layer["w"].shape[0] for layer in agent.actor]
        + [agent.actor[-1]["w"].shape[1]])
    c_specs = agent.critic_specs or mlp_specs(
        [layer["w"].shape[0] for layer in agent.critic]
        + [agent.critic[-1]["w"].shape[1]])

    # --- Fisher statistics (sampled-label losses, a2c_acktr.py:53-68) ---
    def actor_fisher(pert):
        logits, _ = stack_apply(agent.actor, a_specs, obs, pert)
        dist = MaskedCategorical(logits=logits, mask=rollout.legal)
        sampled = dist.sample(key)
        return -dist.log_prob(sampled).mean()

    def critic_fisher(pert):
        values, _ = stack_apply(agent.critic, c_specs, obs, pert)
        noise = jax.random.normal(key, values.shape)
        target = jax.lax.stop_gradient(values + noise)
        return -cfg.value_loss_coef * ((values - target) ** 2).mean()

    do_stats = agent.kfac_actor.step % cfg.t_stat == 0
    ka = agent.kfac_actor
    kc = agent.kfac_critic
    _, a_inputs = stack_apply(agent.actor, a_specs, obs)
    _, c_inputs = stack_apply(agent.critic, c_specs, obs)
    g_actor = jax.grad(actor_fisher)(
        stack_zero_perturb(agent.actor, a_specs, K))
    g_critic = jax.grad(critic_fisher)(
        stack_zero_perturb(agent.critic, c_specs, K))

    ka_new = update_fisher_stats(ka, cfg, a_inputs, g_actor)
    kc_new = update_fisher_stats(kc, cfg, c_inputs, g_critic)
    ka = jax.tree.map(lambda n, o: jnp.where(do_stats, n, o), ka_new, ka)
    kc = jax.tree.map(lambda n, o: jnp.where(do_stats, n, o), kc_new, kc)

    do_inv = ka.step % cfg.t_inv == 0
    ka = refresh_eigendecomp(ka, do_inv)
    kc = refresh_eigendecomp(kc, do_inv)

    # --- A2C loss gradients -------------------------------------------
    def loss_fn(actor, critic):
        logits, _ = stack_apply(actor, a_specs, obs)
        values, _ = stack_apply(critic, c_specs, obs)
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
    return agent.replace(actor=actor, critic=critic, kfac_actor=ka,
                         kfac_critic=kc), metrics
