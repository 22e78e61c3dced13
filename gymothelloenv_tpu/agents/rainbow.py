"""Rainbow DQN — the capability the reference *imports but cannot run*
(``from Rainbow.agent import Agent`` against an absent external package,
util.py:6; ``create_policy('rainbow')`` util.py:42-43, used as the default
protagonist of run_self_play.py).

Components (on top of agents/dqn.py's double/dueling/PER/n-step):
  * Noisy linear layers (factorized Gaussian noise; Fortunato et al.) —
    exploration without epsilon.
  * C51 distributional value head (Bellemare et al.): 51-atom categorical
    returns with the projected-Bellman cross-entropy loss.

``RainbowNet`` = conv trunk -> noisy dueling atom heads;
``rainbow_train_batch`` plugs into the same replay/n-step/trainer stack as
DQN.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from gymothelloenv_tpu.agents.dqn import (DQNState, featurize3,
                                          shard_minibatch_idx)
from gymothelloenv_tpu.agents.replay import (Replay, ReplayConfig,
                                             replay_gather,
                                             replay_sample_idx,
                                             replay_update_priorities)
from gymothelloenv_tpu.models.nets import ConvTrunk, torch_default_init


@dataclasses.dataclass(frozen=True)
class RainbowConfig:
    board_size: int = 8
    state_channels: int = 3
    gamma: float = 0.99
    n_step: int = 3
    num_atoms: int = 51
    v_min: float = -1.0          # reward/64-scaled disk diffs live in ±1
    v_max: float = 1.0
    lr: float = 6.25e-5
    adam_eps: float = 1.5e-4
    batch_size: int = 32
    target_update_interval: int = 10_000
    train_interval: int = 4
    initial_replay_size: int = 20_000
    reward_scale: float = 1.0 / 64.0

    @property
    def num_actions(self) -> int:
        return self.board_size ** 2

    @property
    def gamma_n(self) -> float:
        return self.gamma ** self.n_step

    @property
    def support(self) -> jnp.ndarray:
        return jnp.linspace(self.v_min, self.v_max, self.num_atoms)


class NoisyDense(nn.Module):
    """Factorized-Gaussian noisy linear layer.  Pass ``noise_key=None`` for
    the deterministic (mean-weight) evaluation path."""
    features: int
    sigma0: float = 0.5

    @nn.compact
    def __call__(self, x, noise_key=None):
        n_in = x.shape[-1]
        bound = 1.0 / math.sqrt(n_in)
        w_mu = self.param("w_mu", nn.initializers.uniform(scale=bound),
                          (n_in, self.features))
        b_mu = self.param("b_mu", nn.initializers.uniform(scale=bound),
                          (self.features,))
        sigma_init = self.sigma0 / math.sqrt(n_in)
        w_sigma = self.param("w_sigma",
                             nn.initializers.constant(sigma_init),
                             (n_in, self.features))
        b_sigma = self.param("b_sigma",
                             nn.initializers.constant(sigma_init),
                             (self.features,))
        if noise_key is None:
            return x @ w_mu + b_mu
        k1, k2 = jax.random.split(noise_key)
        f_in = jax.random.normal(k1, (n_in,))
        f_out = jax.random.normal(k2, (self.features,))
        f = lambda e: jnp.sign(e) * jnp.sqrt(jnp.abs(e))
        w_eps = jnp.outer(f(f_in), f(f_out))
        b_eps = f(f_out)
        return x @ (w_mu + w_sigma * w_eps) + (b_mu + b_sigma * b_eps)


class RainbowNet(nn.Module):
    """Conv trunk -> noisy dueling C51 heads; returns RAW atom logits
    (..., A, num_atoms).  Normalization (softmax / log_softmax over the
    atom axis) is the CONSUMER's job — atoms normalize per (sample,
    action) row independently, so the loss can select its single action
    row BEFORE normalizing, cutting the train-forward/backward softmax
    traffic by A=64x (the round-4 trace showed the in-net log_softmax
    over (4096, 64, 51) plus its transpose as the dominant update cost,
    data/logs/queue/20_rainbow_trace.log)."""
    num_actions: int
    num_atoms: int = 51
    hidden: int = 128

    @nn.compact
    def __call__(self, x, noise_key=None):
        x = jnp.moveaxis(x, -3, -1)
        h = ConvTrunk(kernel_init=torch_default_init())(x)
        keys = ([None] * 4 if noise_key is None
                else list(jax.random.split(noise_key, 4)))
        adv = nn.relu(NoisyDense(self.hidden)(h, keys[0]))
        val = nn.relu(NoisyDense(self.hidden)(h, keys[1]))
        adv = NoisyDense(self.num_actions * self.num_atoms)(adv, keys[2])
        val = NoisyDense(self.num_atoms)(val, keys[3])
        adv = adv.reshape(adv.shape[:-1] + (self.num_actions,
                                            self.num_atoms))
        val = val.reshape(val.shape[:-1] + (1, self.num_atoms))
        return val + adv - adv.mean(axis=-2, keepdims=True)


def make_rainbow_net(cfg: RainbowConfig) -> RainbowNet:
    return RainbowNet(num_actions=cfg.num_actions,
                      num_atoms=cfg.num_atoms)


def make_rainbow_optimizer(cfg: RainbowConfig):
    return optax.adam(cfg.lr, eps=cfg.adam_eps)


def rainbow_init(cfg: RainbowConfig, key: jax.Array) -> DQNState:
    net = make_rainbow_net(cfg)
    dummy = jnp.zeros((1, cfg.state_channels, cfg.board_size,
                       cfg.board_size))
    params = net.init(key, dummy)
    return DQNState(params=params,
                    target_params=jax.tree.map(jnp.copy, params),
                    opt_state=make_rainbow_optimizer(cfg).init(params),
                    t=jnp.int32(0))


def expected_q(logits: jnp.ndarray, cfg: RainbowConfig) -> jnp.ndarray:
    """(..., A, atoms) RAW atom logits -> (..., A) expected values."""
    return (jax.nn.softmax(logits, axis=-1) * cfg.support).sum(axis=-1)


def rainbow_act(params, apply_fn, board, turn, legal, key,
                cfg: RainbowConfig) -> jnp.ndarray:
    """Greedy over expected Q of the noisy net — exploration comes from the
    noise, not epsilon."""
    log_p = apply_fn(params, featurize3(board, turn), key)
    q = expected_q(log_p, cfg)
    return jnp.argmax(jnp.where(legal, q, -jnp.inf), axis=-1).astype(
        jnp.int32)


def _project_distribution(next_probs, rewards, not_done,
                          cfg: RainbowConfig):
    """Categorical projection of r + gamma^n * z onto the fixed support
    (C51)."""
    z = cfg.support                                   # (atoms,)
    tz = rewards[:, None] + not_done[:, None] * cfg.gamma_n * z[None, :]
    tz = jnp.clip(tz, cfg.v_min, cfg.v_max)
    dz = (cfg.v_max - cfg.v_min) / (cfg.num_atoms - 1)
    b = (tz - cfg.v_min) / dz                         # (N, atoms)
    # Linear-interpolation kernel instead of floor/ceil scatter-adds:
    # source atom j at position b contributes max(0, 1 - |b - k|) to
    # target atom k — identical mass split (floor gets hi-b, ceil gets
    # b-lo, integer b gets everything), but it lowers as one fused
    # einsum over (N, atoms, atoms) instead of two (N*atoms)-element
    # scatters, which cost ~2.9 ms/update on TPU
    # (scripts/trace_rainbow_chunk.py fusion.6/7).
    k = jnp.arange(cfg.num_atoms, dtype=jnp.float32)
    w = jnp.clip(1.0 - jnp.abs(b[:, :, None] - k[None, None, :]),
                 0.0, 1.0)                            # (N, src, tgt)
    return jnp.einsum("ns,nst->nt", next_probs, w)


def rainbow_loss_grads(state: DQNState, cfg: RainbowConfig, apply_fn,
                       batch, key: jax.Array):
    """Shared C51 target/loss math for both replay layouts (replicated
    and per-shard): double-DQN action selection over expected Q,
    projected-Bellman target distribution, KL loss; ``key`` drives the
    noisy-net sample.  ``batch`` is the (board, turn, action, reward,
    next_board, next_turn, done) tuple; returns ((loss, kl), grads)."""
    k_online, k_target, k_train = jax.random.split(key, 3)
    board, turn, action, reward, next_board, next_turn, done = batch
    next_obs = featurize3(next_board, next_turn)

    # Double: online net picks a*, target net evaluates its distribution.
    # All applies return RAW atom logits; rows are selected one-hot
    # FIRST (exact — atoms normalize per action row independently, and
    # one-hot reduces avoid per-row gather costs, ops/gather.py), then
    # normalized over just (N, atoms) instead of (N, A, atoms).
    online_next = apply_fn(state.params, next_obs, k_online)
    next_a = jnp.argmax(expected_q(online_next, cfg), axis=-1)
    target_next = apply_fn(state.target_params, next_obs, k_target)
    next_oh = (next_a[:, None]
               == jnp.arange(target_next.shape[1]))[..., None]
    next_row = jnp.where(next_oh, target_next, 0.0).sum(axis=1)
    next_probs = jax.nn.softmax(next_row, axis=-1)
    proj = _project_distribution(next_probs, reward,
                                 1.0 - done.astype(jnp.float32), cfg)
    proj = jax.lax.stop_gradient(proj)

    def loss_fn(params):
        logits = apply_fn(params, featurize3(board, turn), k_train)
        act_oh = (action[:, None] == jnp.arange(logits.shape[1]))[..., None]
        row = jnp.where(act_oh, logits, 0.0).sum(axis=1)
        log_pa = jax.nn.log_softmax(row, axis=-1)
        kl = -(proj * log_pa).sum(-1)
        return kl.mean(), kl

    return jax.value_and_grad(loss_fn, has_aux=True)(state.params)


def rainbow_train_batch(state: DQNState, replay: Replay,
                        cfg: RainbowConfig, rb_cfg: ReplayConfig,
                        apply_fn, optimizer, key: jax.Array, mesh=None):
    """C51 projected-Bellman update with double-DQN action selection and
    PER priorities = KL losses.  Returns (state, replay, loss).
    ``mesh``: shard the minibatch over 'data' (see
    agents.dqn.shard_minibatch_idx)."""
    k_sample, k_core = jax.random.split(key)
    idx = replay_sample_idx(replay, rb_cfg, k_sample, cfg.batch_size)
    if mesh is not None:
        idx = shard_minibatch_idx(idx, mesh)
    batch = replay_gather(replay, idx)
    (loss, kl), grads = rainbow_loss_grads(state, cfg, apply_fn, batch,
                                           k_core)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    if rb_cfg.prioritized:
        replay = replay_update_priorities(replay, rb_cfg, idx, kl)
    return state.replace(params=params, opt_state=opt_state), replay, loss
