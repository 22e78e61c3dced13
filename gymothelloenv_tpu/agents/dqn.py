"""DQN agent — the TPU-native rebuild of ``DQNAgent`` (dqn.py:135-503):
epsilon-greedy over legal moves, n-step returns, target network, optional
Double-DQN / Dueling / prioritized replay, RMSprop, reward/64 scaling.

All decision/learning paths are pure jitted functions over an on-device
agent state; the trainer (train/dqn_trainer.py) drives them from batched
self-play rollouts instead of the reference's single-env ``run()`` hook.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gymothelloenv_tpu.agents.replay import (Replay, ReplayConfig,
                                             replay_gather,
                                             replay_sample_idx,
                                             replay_update_priorities)
from gymothelloenv_tpu.models.nets import DQNNet, DuelingDQNNet
from gymothelloenv_tpu.ops.gather import onehot_select_last


@dataclasses.dataclass(frozen=True)
class DQNConfig:
    """Defaults mirror DQNAgent.__init__ (dqn.py:136-199)."""
    board_size: int = 8
    state_channels: int = 3        # state_length (3-plane make_state)
    gamma: float = 0.99
    n_step: int = 1
    double: bool = False
    dueling: bool = False
    lr: float = 0.00025
    rms_eps: float = 0.01
    rms_momentum: float = 0.95
    batch_size: int = 32
    initial_epsilon: float = 1.0
    final_epsilon: float = 0.1
    annealing_steps: int = 1_000_000
    initial_replay_size: int = 20_000
    target_update_interval: int = 10_000
    train_interval: int = 4
    reward_scale: float = 1.0 / 64.0   # dqn.py:292
    test_epsilon: float = 0.05         # dqn.py:481

    @property
    def gamma_n(self) -> float:
        return self.gamma ** self.n_step

    @property
    def num_actions(self) -> int:
        return self.board_size ** 2


@struct.dataclass
class DQNState:
    params: dict
    target_params: dict
    opt_state: tuple
    t: jnp.ndarray            # int32 () transitions seen (dqn.py's self.t)


def make_dqn_net(cfg: DQNConfig):
    cls = DuelingDQNNet if cfg.dueling else DQNNet
    return cls(num_actions=cfg.num_actions)


def make_dqn_optimizer(cfg: DQNConfig):
    """RMSprop(lr, eps=0.01, momentum=0.95) (dqn.py:244)."""
    return optax.rmsprop(cfg.lr, eps=cfg.rms_eps, momentum=cfg.rms_momentum)


def dqn_init(cfg: DQNConfig, key: jax.Array) -> DQNState:
    net = make_dqn_net(cfg)
    dummy = jnp.zeros((1, cfg.state_channels, cfg.board_size,
                       cfg.board_size))
    params = net.init(key, dummy)
    return DQNState(
        params=params,
        target_params=jax.tree.map(jnp.copy, params),
        opt_state=make_dqn_optimizer(cfg).init(params),
        t=jnp.int32(0),
    )


def epsilon_at(cfg: DQNConfig, t: jnp.ndarray) -> jnp.ndarray:
    """Linear anneal, frozen until the replay warmup ends
    (dqn.py:196-198, :283-284)."""
    rate = (cfg.initial_epsilon - cfg.final_epsilon) / cfg.annealing_steps
    steps = jnp.maximum(t - cfg.initial_replay_size, 0).astype(jnp.float32)
    return jnp.maximum(cfg.initial_epsilon - rate * steps,
                       cfg.final_epsilon)


def featurize3(board: jnp.ndarray, turn: jnp.ndarray) -> jnp.ndarray:
    """3-plane [black, white, turn] features from raw board+turn
    (run_2agent.py:29-46).  Shape-polymorphic over leading dims."""
    black = (board == -1).astype(jnp.float32)
    white = (board == 1).astype(jnp.float32)
    turn_plane = jnp.broadcast_to(
        ((turn.astype(jnp.float32) + 1.0) / 2.0)[..., None, None],
        board.shape)
    return jnp.stack([black, white, turn_plane], axis=-3)


def greedy_legal_action(q: jnp.ndarray, legal: jnp.ndarray) -> jnp.ndarray:
    """Argmax over legal-move Q values (dqn.py:270-273)."""
    return jnp.argmax(jnp.where(legal, q, -jnp.inf), axis=-1).astype(
        jnp.int32)


def dqn_act(params, apply_fn: Callable, board, turn, legal, key,
            epsilon) -> jnp.ndarray:
    """Batched epsilon-greedy over legal moves (dqn.py:264-286).
    ``board`` (N, B, B), ``legal`` (N, A)."""
    k_eps, k_rand = jax.random.split(key)
    n = board.shape[0]
    q = apply_fn(params, featurize3(board, turn))
    greedy = greedy_legal_action(q, legal)
    rand_logits = jnp.where(legal, 0.0, -jnp.inf)
    # One batched categorical (independent rows from one key) — per-row
    # vmapped keys cost a separate threefry stream per env.
    random = jax.random.categorical(k_rand, rand_logits,
                                    axis=-1).astype(jnp.int32)
    use_rand = jax.random.uniform(k_eps, (n,)) < epsilon
    return jnp.where(use_rand, random, greedy)


def shard_minibatch_idx(idx: jnp.ndarray, mesh) -> jnp.ndarray:
    """Constrain sampled replay indices over the mesh's 'data' axis so the
    row gather, featurize and gradient compute all run data-parallel —
    GSPMD inserts the gradient all-reduce.  The replay itself stays
    replicated: sampling is GLOBAL (exact single-device PER semantics; the
    per-shard-replay alternative trades that exactness for sharded
    capacity — see parallel/README note in docs/DESIGN.md)."""
    from jax.sharding import NamedSharding, PartitionSpec
    return jax.lax.with_sharding_constraint(
        idx, NamedSharding(mesh, PartitionSpec("data")))


def dqn_loss_grads(state: DQNState, cfg: DQNConfig, apply_fn: Callable,
                   batch):
    """Shared target/loss math for both replay layouts (replicated and
    per-shard): y = r + gamma^n * max_a' targetQ(s', a') (Double: online
    argmax, dqn.py:439-444), Huber loss on the gathered Q.  ``batch`` is
    the (board, turn, action, reward, next_board, next_turn, done)
    tuple; returns ((loss, td), grads)."""
    board, turn, action, reward, next_board, next_turn, done = batch
    next_obs = featurize3(next_board, next_turn)
    target_q = apply_fn(state.target_params, next_obs)
    if cfg.double:
        online_next = apply_fn(state.params, next_obs)
        next_a = jnp.argmax(online_next, axis=-1)
        boot = onehot_select_last(target_q, next_a)
    else:
        boot = target_q.max(axis=-1)
    y = reward + (1.0 - done.astype(jnp.float32)) * cfg.gamma_n * boot
    # NOTE(parity): the reference bootstraps the non-double target with
    # gamma (not gamma^n) even when n_step > 1 (dqn.py:444) — arguably a
    # bug; we use gamma^n in both branches (correct n-step target).

    def loss_fn(params):
        q = apply_fn(params, featurize3(board, turn))
        q_a = onehot_select_last(q, action)
        td = y - q_a
        return optax.huber_loss(q_a, y).mean(), td

    return jax.value_and_grad(loss_fn, has_aux=True)(state.params)


def dqn_train_batch(state: DQNState, replay: Replay, cfg: DQNConfig,
                    rb_cfg: ReplayConfig, apply_fn: Callable,
                    optimizer, key: jax.Array, mesh=None):
    """One minibatch update (train_network, dqn.py:407-467):
    y = r + gamma^n * max_a' targetQ(s', a') (Double: online argmax),
    Huber loss on gathered Q, RMSprop step, PER priority refresh.
    Returns (state, replay, loss).  ``mesh``: shard the minibatch over
    'data' (global sampling, DP gradients)."""
    idx = replay_sample_idx(replay, rb_cfg, key, cfg.batch_size)
    if mesh is not None:
        idx = shard_minibatch_idx(idx, mesh)
    batch = replay_gather(replay, idx)
    (loss, td), grads = dqn_loss_grads(state, cfg, apply_fn, batch)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    if rb_cfg.prioritized:
        replay = replay_update_priorities(replay, rb_cfg, idx, td)
    return state.replace(params=params, opt_state=opt_state), replay, loss


def maybe_sync_target(state: DQNState, cfg: DQNConfig,
                      crossed: jnp.ndarray) -> DQNState:
    """Copy online -> target when the interval boundary was crossed
    (dqn.py:357-358)."""
    target = jax.tree.map(
        lambda tp, p: jnp.where(crossed, p, tp),
        state.target_params, state.params)
    return state.replace(target_params=target)
