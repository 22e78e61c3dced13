"""Batched auto-resetting Othello environment with random openings.

The TPU-native replacement for the reference's multiprocess vectorized env
runtime (envs.py:7-41 + 8 worker processes): the whole batch is a pytree of
device arrays stepped in lockstep under ``vmap``/``jit`` — no processes, no
pipes, no sentinel protocol.

Random-opening semantics reproduce ``SimpleOthelloEnv`` (othello.py:60-79):
at reset each game draws ``max_rand_steps = 2 * U{0..initial_rand_steps//2}``
and while the counter lasts, the caller's action is replaced by a uniform
random legal move (one counter tick per ply, both colors).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.state import EnvConfig, OthelloState
from gymothelloenv_tpu.policies.scripted import random_action
from gymothelloenv_tpu.train.tournament import draw_max_rand_steps


@struct.dataclass
class VecEnvState:
    core: OthelloState        # batched (N, ...)
    rand_left: jnp.ndarray    # int32 (N,) forced-random plies remaining
    key: jnp.ndarray          # per-game PRNG keys (N, 2) uint32


@struct.dataclass
class VecStepResult:
    state: VecEnvState
    obs: jnp.ndarray          # (N, B, B) canonical boards
    reward: jnp.ndarray       # (N,) mover-perspective terminal rewards
    done: jnp.ndarray         # (N,)


def _single_reset(key: jax.Array, cfg: EnvConfig,
                  initial_rand_steps: int):
    key, sub = jax.random.split(key)
    return (core.reset(cfg), draw_max_rand_steps(sub, initial_rand_steps),
            key)


@functools.partial(jax.jit, static_argnames=("cfg", "num_envs",
                                             "initial_rand_steps"))
def vec_reset(key: jax.Array, cfg: EnvConfig, num_envs: int,
              initial_rand_steps: int = 0) -> VecEnvState:
    keys = jax.random.split(key, num_envs)
    states, rand_left, keys = jax.vmap(
        _single_reset, in_axes=(0, None, None))(keys, cfg,
                                                initial_rand_steps)
    return VecEnvState(core=states, rand_left=rand_left, key=keys)


def _single_step(env_key, state: OthelloState, rand_left, action,
                 cfg: EnvConfig, initial_rand_steps: int):
    """One ply of one game with random-opening override + autoreset."""
    env_key, k_rand, k_reset = jax.random.split(env_key, 3)

    use_rand = rand_left > 0
    action = jnp.where(use_rand, random_action(k_rand, state.legal), action)
    rand_left = jnp.where(use_rand, rand_left - 1, rand_left)

    res = core.step(state, action, cfg)

    fresh, fresh_rand_left, k_reset = _single_reset(
        k_reset, cfg, initial_rand_steps)
    next_state = jax.tree.map(
        lambda f, s: jnp.where(res.done, f, s), fresh, res.state)
    rand_left = jnp.where(res.done, fresh_rand_left, rand_left)
    return (VecEnvState(core=next_state, rand_left=rand_left, key=env_key),
            res.obs, res.reward, res.done)


@functools.partial(jax.jit, static_argnames=("cfg", "initial_rand_steps"))
def vec_step(state: VecEnvState, actions: jnp.ndarray, cfg: EnvConfig,
             initial_rand_steps: int = 0) -> VecStepResult:
    """Step every game; finished games auto-reset (the returned obs/reward/
    done describe the terminal transition, the state is the fresh game)."""
    new_state, obs, reward, done = jax.vmap(
        _single_step, in_axes=(0, 0, 0, 0, None, None))(
        state.key, state.core, state.rand_left, actions, cfg,
        initial_rand_steps)
    return VecStepResult(state=new_state, obs=obs, reward=reward, done=done)
