"""Reference-API policy classes (drop-in for ``simple_policies.py``).

Same duck-typed protocol — ``reset(env)``, ``get_action(obs)``,
``get_test_action(obs)``, optional ``seed(s)`` — with decisions computed by
the jitted JAX policies.  ``RandomPolicy`` draws through
``np.random.RandomState`` in the reference's exact order
(simple_policies.py:21-44) so seeded runs are bit-identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core.state import EnvConfig, OthelloState
from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.policies.scripted import (greedy_action,
                                                 maximin_action)

WHITE_DISK = 1
BLACK_DISK = -1


def _unwrap(env):
    return env.env if hasattr(env, "env") else env


def _jax_state(env) -> OthelloState:
    board = jnp.asarray(env.board_state, jnp.int8)
    turn = jnp.int8(env.player_turn)
    return OthelloState(board=board, turn=turn,
                        legal=core.legal_actions(board, turn),
                        terminated=jnp.bool_(False), winner=jnp.int8(0))


class RandomPolicy:
    """simple_policies.py:21-44 (bit-exact RandomState draws)."""

    def __init__(self, seed=0):
        self.rnd = np.random.RandomState(seed=seed)
        self.env = None

    def reset(self, env):
        self.env = _unwrap(env)

    def seed(self, seed):
        self.rnd = np.random.RandomState(seed=seed)

    def get_action(self, obs):
        possible_moves = self.env.possible_moves
        ix = self.rnd.randint(0, len(possible_moves))
        return possible_moves[ix]

    def get_test_action(self, obs):
        return self.get_action(obs)


@functools.cache
def _jit_greedy():
    return jax.jit(greedy_action)


@functools.cache
def _jit_maximin(board_size: int, depth: int):
    cfg = EnvConfig(board_size=board_size)
    return jax.jit(functools.partial(maximin_action, cfg=cfg,
                                     max_search_depth=depth))


class GreedyPolicy:
    """simple_policies.py:57-95 — 1-ply disk-count maximization.  Reads the
    position from the env handle (the reference un-featurizes its obs and
    replays on a scratch env; same decision either way)."""

    def __init__(self):
        self.env = None

    def reset(self, env):
        self.env = _unwrap(env)

    def get_action(self, obs):
        return int(_jit_greedy()(_jax_state(self.env)))

    def get_test_action(self, obs):
        return self.get_action(obs)


class MaxiMinPolicy:
    """simple_policies.py:98-163 — depth-k maximin (with the reference's
    forced-pass node handling)."""

    def __init__(self, max_search_depth=1):
        self.env = None
        self.max_search_depth = max_search_depth

    def reset(self, env):
        self.env = _unwrap(env)

    def get_action(self, obs):
        fn = _jit_maximin(self.env.board_size, self.max_search_depth)
        return int(fn(_jax_state(self.env)))

    def get_test_action(self, obs):
        return self.get_action(obs)


class HumanPolicy:
    """simple_policies.py:166-177."""

    def __init__(self, board_size=8):
        self.board_size = board_size

    def reset(self, env):
        pass

    def get_action(self, obs):
        return int(input("Enter action index:"))

    def get_test_action(self, obs):
        return self.get_action(obs)
