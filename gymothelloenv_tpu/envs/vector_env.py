"""Batched auto-resetting Othello environment with random openings.

The TPU-native replacement for the reference's multiprocess vectorized env
runtime (envs.py:7-41 + 8 worker processes): the whole batch is a pytree of
device arrays stepped in lockstep under ``vmap``/``jit`` — no processes, no
pipes, no sentinel protocol.

Random-opening semantics reproduce ``SimpleOthelloEnv`` (othello.py:60-79):
at reset each game draws ``max_rand_steps = 2 * U{0..initial_rand_steps//2}``
and while the counter lasts, the caller's action is replaced by a uniform
random legal move (one counter tick per ply, both colors).

RNG layout: ONE scalar key advances per step; per-game randomness comes
from batched draws (categorical over (N, A) legal logits, (N,) randints) —
a handful of threefry blocks per step instead of 3 per game per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.state import EnvConfig, OthelloState
from gymothelloenv_tpu.policies.scripted import random_actions_batched


@struct.dataclass
class VecEnvState:
    core: OthelloState        # batched (N, ...)
    rand_left: jnp.ndarray    # int32 (N,) forced-random plies remaining
    key: jnp.ndarray          # single PRNG key for the whole batch


@struct.dataclass
class VecStepResult:
    state: VecEnvState
    obs: jnp.ndarray          # (N, B, B) canonical boards
    reward: jnp.ndarray       # (N,) mover-perspective terminal rewards
    done: jnp.ndarray         # (N,)


def _draw_rand_left(key: jax.Array, n: int,
                    initial_rand_steps: int) -> jnp.ndarray:
    """Batched ``rnd.randint(0, init//2 + 1) * 2`` (othello.py:153-154)."""
    return 2 * jax.random.randint(key, (n,), 0,
                                  initial_rand_steps // 2 + 1,
                                  dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("cfg", "num_envs",
                                             "initial_rand_steps"))
def vec_reset(key: jax.Array, cfg: EnvConfig, num_envs: int,
              initial_rand_steps: int = 0) -> VecEnvState:
    key, k_rand = jax.random.split(key)
    states = jax.vmap(lambda _: core.reset(cfg))(jnp.arange(num_envs))
    return VecEnvState(
        core=states,
        rand_left=_draw_rand_left(k_rand, num_envs, initial_rand_steps),
        key=key)


@functools.partial(jax.jit, static_argnames=("cfg", "initial_rand_steps"))
def vec_step(state: VecEnvState, actions: jnp.ndarray, cfg: EnvConfig,
             initial_rand_steps: int = 0) -> VecStepResult:
    """Step every game; finished games auto-reset (the returned obs/reward/
    done describe the terminal transition, the state is the fresh game)."""
    key, k_rand, k_reset = jax.random.split(state.key, 3)
    n = actions.shape[0]

    use_rand = state.rand_left > 0
    rand_actions = random_actions_batched(k_rand, state.core.legal)
    actions = jnp.where(use_rand, rand_actions, actions)
    rand_left = jnp.where(use_rand, state.rand_left - 1, state.rand_left)

    res = jax.vmap(core.step, in_axes=(0, 0, None))(state.core, actions,
                                                    cfg)

    fresh = jax.vmap(lambda _: core.reset(cfg))(jnp.arange(n))
    next_core = jax.tree.map(
        lambda f, s: jnp.where(
            res.done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s),
        fresh, res.state)
    rand_left = jnp.where(
        res.done, _draw_rand_left(k_reset, n, initial_rand_steps),
        rand_left)
    return VecStepResult(
        state=VecEnvState(core=next_core, rand_left=rand_left, key=key),
        obs=res.obs, reward=res.reward, done=res.done)
