"""Bitboard-native batched auto-resetting Othello env (8x8 only).

Same semantics as envs/vector_env.py (the rebuild of the reference's
multiprocess vectorized runtime, envs.py:7-41 + SimpleOthelloEnv random
openings othello.py:60-79), but the state never leaves the packed uint32
representation: no plane pack/unpack per step and one randint per game for
the random-opening override instead of a (N, 64) gumbel categorical.  This
is the configuration the headline bench (bench.py) measures; featurize on
demand with ``bitboard.to_board`` when a network needs planes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.core import bitboard as bb
from gymothelloenv_tpu.core.state import EnvConfig


@struct.dataclass
class BitVecEnvState:
    core: bb.BitState         # batched (N, ...)
    rand_left: jnp.ndarray    # int32 (N,) forced-random plies remaining
    key: jnp.ndarray          # single PRNG key for the whole batch


@struct.dataclass
class BitVecStepResult:
    state: BitVecEnvState
    reward: jnp.ndarray       # (N,) mover-perspective terminal rewards
    done: jnp.ndarray         # (N,)


def _draw_rand_left(key: jax.Array, n: int,
                    initial_rand_steps: int) -> jnp.ndarray:
    """Batched ``rnd.randint(0, init//2 + 1) * 2`` (othello.py:153-154)."""
    return 2 * jax.random.randint(key, (n,), 0,
                                  initial_rand_steps // 2 + 1,
                                  dtype=jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_envs",
                                             "initial_rand_steps"))
def bitvec_reset(key: jax.Array, num_envs: int,
                 initial_rand_steps: int = 0) -> BitVecEnvState:
    key, k_rand = jax.random.split(key)
    return BitVecEnvState(
        core=bb.bit_reset((num_envs,)),
        rand_left=_draw_rand_left(k_rand, num_envs, initial_rand_steps),
        key=key)


@functools.partial(jax.jit, static_argnames=("cfg", "initial_rand_steps"))
def bitvec_step(state: BitVecEnvState, actions: jnp.ndarray,
                cfg: EnvConfig,
                initial_rand_steps: int = 0) -> BitVecStepResult:
    """Step every game; finished games auto-reset (reward/done describe the
    terminal transition, the returned state is the fresh game)."""
    assert cfg.board_size == 8, "bit env is the 8x8 fast path"
    key, k_rand, k_reset = jax.random.split(state.key, 3)
    n = actions.shape[0]

    if initial_rand_steps == 0:
        # Static fast path: no game ever enters the forced-random phase,
        # skip the override draw entirely.
        rand_left = state.rand_left
    else:
        use_rand = state.rand_left > 0
        rand_actions = bb.random_legal_bit(k_rand, state.core.legal)
        actions = jnp.where(use_rand, rand_actions, actions)
        rand_left = jnp.where(use_rand, state.rand_left - 1,
                              state.rand_left)

    res = bb.bit_step(
        state.core, actions,
        sudden_death_on_invalid_move=cfg.sudden_death_on_invalid_move,
        num_disk_as_reward=cfg.num_disk_as_reward)

    fresh = bb.bit_reset((n,))
    next_core = jax.tree.map(
        lambda f, s: jnp.where(
            res.done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s),
        fresh, res.state)
    if initial_rand_steps != 0:
        rand_left = jnp.where(
            res.done, _draw_rand_left(k_reset, n, initial_rand_steps),
            rand_left)
    return BitVecStepResult(
        state=BitVecEnvState(core=next_core, rand_left=rand_left, key=key),
        reward=res.reward, done=res.done)
