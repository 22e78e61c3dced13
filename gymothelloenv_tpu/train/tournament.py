"""On-device tournament / evaluation rollouts.

Replaces the reference's per-game Python loops (run.py:28-134) with a single
jitted program: a batch of games is stepped in lockstep under ``vmap`` inside
``lax.while_loop`` until every game terminates.  Colors are fixed (black =
first policy), matching the README table protocol (README.md:36-44); random
openings reproduce ``OthelloEnv``'s shared counter semantics
(othello.py:151-199): each game independently draws
``max_rand_steps = 2 * U{0..init_rand_steps//2}`` and the first
``max_rand_steps`` plies (from either side) are replaced by uniform random
legal moves.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.state import EnvConfig, OthelloState
from gymothelloenv_tpu.policies.scripted import random_action

PolicyFn = Callable[[jax.Array, OthelloState], jnp.ndarray]


def _policy_call(act: PolicyFn, keys: jax.Array,
                 states: OthelloState) -> jnp.ndarray:
    """Evaluate a policy on a game batch.  Per-game policies are vmapped;
    policies marked ``batched = True`` (e.g. memory-bounded chunked
    searches from ``policies.chunking``) receive the whole batch."""
    if getattr(act, "batched", False):
        return act(keys, states)
    return jax.vmap(act)(keys, states)


def draw_max_rand_steps(key: jax.Array, init_rand_steps: int) -> jnp.ndarray:
    """``rnd.randint(0, init//2 + 1) * 2`` (othello.py:153-154)."""
    return 2 * jax.random.randint(key, (), 0, init_rand_steps // 2 + 1,
                                  dtype=jnp.int32)


def play_games_impl(key: jax.Array,
                    cfg: EnvConfig,
                    act_black: PolicyFn,
                    act_white: PolicyFn,
                    num_games: int,
                    init_rand_steps: int = 0,
                    max_plies: int = 0) -> jnp.ndarray:
    """Traceable body of :func:`play_games` — use this directly inside a
    larger jitted program (e.g. a trainer's eval step, where the policy
    closures capture traced params).  Returns winners int8 (num_games,)
    (+1 white, -1 black, 0 draw)."""
    if max_plies <= 0:
        # Enough for any legal game: <= B*B - 4 placements, plus the engine
        # never needs more plies than placements (passes don't consume a ply
        # in this engine — the turn bounce happens inside step()).
        max_plies = cfg.board_size * cfg.board_size

    game_keys = jax.random.split(key, num_games + 1)
    key = game_keys[0]
    states = jax.vmap(lambda _: core.reset(cfg))(jnp.arange(num_games))
    rand_left = jax.vmap(draw_max_rand_steps,
                         in_axes=(0, None))(game_keys[1:], init_rand_steps)

    def cond(carry):
        states, _, _, ply = carry
        return (~states.terminated.all()) & (ply < max_plies)

    def body(carry):
        states, rand_left, key, ply = carry
        key, k_rand, k_black, k_white = jax.random.split(key, 4)
        n = num_games

        a_rand = jax.vmap(random_action)(jax.random.split(k_rand, n),
                                         states.legal)
        a_black = _policy_call(act_black, jax.random.split(k_black, n),
                               states)
        a_white = _policy_call(act_white, jax.random.split(k_white, n),
                               states)
        action = jnp.where(rand_left > 0, a_rand,
                           jnp.where(states.turn == -1, a_black, a_white))

        stepped = jax.vmap(core.step, in_axes=(0, 0, None))(
            states, action, cfg)
        live = ~states.terminated
        new_states = jax.tree.map(
            lambda new, old: jnp.where(
                live.reshape((-1,) + (1,) * (old.ndim - 1)), new, old),
            stepped.state, states)
        new_rand_left = jnp.where(live, jnp.maximum(rand_left - 1, 0),
                                  rand_left)
        return new_states, new_rand_left, key, ply + 1

    states, _, _, _ = jax.lax.while_loop(
        cond, body, (states, rand_left, key, jnp.int32(0)))
    return states.winner


@functools.partial(jax.jit,
                   static_argnames=("cfg", "act_black", "act_white",
                                    "num_games", "init_rand_steps",
                                    "max_plies"))
def play_games(key: jax.Array,
               cfg: EnvConfig,
               act_black: PolicyFn,
               act_white: PolicyFn,
               num_games: int,
               init_rand_steps: int = 0,
               max_plies: int = 0) -> jnp.ndarray:
    """Jitted :func:`play_games_impl` for standalone use with static
    (non-closure) policies."""
    return play_games_impl(key, cfg, act_black, act_white, num_games,
                           init_rand_steps, max_plies)


def tally(winners: jnp.ndarray):
    """(black_wins, draws, white_wins) — the README table cell for the
    black-playing row policy."""
    return ((winners == -1).sum(), (winners == 0).sum(), (winners == 1).sum())
