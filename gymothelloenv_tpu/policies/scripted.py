"""Scripted baseline policies as pure JAX functions.

Reproduces the behaviour of ``/root/reference/simple_policies.py`` without
scratch-environment replay: the greedy and maximin policies expand candidate
moves with batched plane algebra instead of stepping copied envs
(simple_policies.py:69-92, :111-155).

All policies share one protocol: ``act(key, state) -> int32 action`` on a
*single* game (vmap for batches).  Scripted policies that need no randomness
ignore ``key``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.core import bitops
from gymothelloenv_tpu.core.state import (EnvConfig, OthelloState,
                                          disk_planes)

_BIG = 1 << 20   # python int: keeps jaxprs free of lifted constants


def random_action(key: jax.Array, legal: jnp.ndarray) -> jnp.ndarray:
    """Uniform sample over legal actions (RandomPolicy,
    simple_policies.py:21-44)."""
    logits = jnp.where(legal, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits).astype(jnp.int32)


def random_actions_batched(key: jax.Array,
                           legal: jnp.ndarray) -> jnp.ndarray:
    """Uniform legal sample for a whole batch from ONE key — rows are
    independent (categorical draws one gumbel per cell).  Cheaper than
    splitting a key per game."""
    logits = jnp.where(legal, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def random_policy(key: jax.Array, state: OthelloState) -> jnp.ndarray:
    return random_action(key, state.legal)


def greedy_action(state: OthelloState) -> jnp.ndarray:
    """1-ply lookahead maximizing own disks after the move
    (GreedyPolicy, simple_policies.py:57-92).

    Own disks after move = current count + 1 + flips, so argmax over flip
    counts with ties broken by lowest action index — the same order the
    reference gets from ``np.argmax`` over ascending ``possible_moves``.
    """
    mine, opp = disk_planes(state.board, state.turn)
    flips = bitops.flip_counts(mine, opp).reshape(-1)
    scores = jnp.where(state.legal, flips, -_BIG)
    return jnp.argmax(scores).astype(jnp.int32)


def greedy_policy(key: jax.Array, state: OthelloState) -> jnp.ndarray:
    del key
    return greedy_action(state)


def _board_after(board: jnp.ndarray, turn: jnp.ndarray,
                 action: jnp.ndarray) -> jnp.ndarray:
    """Board after ``turn`` plays ``action`` (assumed legal)."""
    B = board.shape[-1]
    onehot = (jnp.arange(B * B) == action).reshape(B, B)
    mine, opp = disk_planes(board, turn)
    mine, opp = bitops.apply_move(onehot, mine, opp)
    return jnp.where(mine, turn, jnp.where(opp, -turn,
                                           jnp.int8(0))).astype(jnp.int8)


def _count_for(board: jnp.ndarray, player: jnp.ndarray) -> jnp.ndarray:
    """Disk count of ``player`` (the maximin leaf value,
    simple_policies.py:122-126)."""
    return (board == player.astype(board.dtype)).sum().astype(jnp.int32)


def _maximin_value(board: jnp.ndarray, persp: jnp.ndarray, me: jnp.ndarray,
                   depth_left: int) -> jnp.ndarray:
    """Value (my disk count) of a node where ``persp`` is to move.

    Matches the reference search exactly (simple_policies.py:111-155),
    including its non-standard pass handling: when the side to move has no
    legal move the node is scored immediately (the reference forces the turn
    to the passed player and then bottoms out on the empty move list,
    simple_policies.py:139-144 + :117-126).
    """
    B = board.shape[-1]
    mine, opp = disk_planes(board, persp)
    legal = bitops.legal_mask(mine, opp).reshape(-1)
    leaf_val = _count_for(board, me)
    if depth_left == 0:
        return leaf_val

    def child_value(action):
        child = _board_after(board, persp, action)
        return _maximin_value(child, -persp, me, depth_left - 1)

    actions = jnp.arange(B * B, dtype=jnp.int32)
    # Depth >= 3 levels would materialize 64^3 boards per game under vmap;
    # serialize the outermost expansion with lax.map to bound memory.
    if depth_left >= 3:
        vals = jax.lax.map(child_value, actions)
    else:
        vals = jax.vmap(child_value)(actions)

    is_max = persp == me
    best = jnp.where(is_max,
                     jnp.max(jnp.where(legal, vals, -_BIG)),
                     jnp.min(jnp.where(legal, vals, _BIG)))
    return jnp.where(legal.any(), best, leaf_val)


def maximin_action(state: OthelloState, cfg: EnvConfig,
                   max_search_depth: int) -> jnp.ndarray:
    """Depth-k maximin on disk count, no alpha-beta (MaxiMinPolicy,
    simple_policies.py:98-163).  Ties break to the lowest action index, the
    reference's first-occurrence ``np.argmax``/``np.argmin``."""
    B = cfg.board_size
    me = state.turn

    def child_value(action):
        child = _board_after(state.board, state.turn, action)
        return _maximin_value(child, -state.turn, me, max_search_depth - 1)

    actions = jnp.arange(B * B, dtype=jnp.int32)
    if max_search_depth >= 3:
        vals = jax.lax.map(child_value, actions)
    else:
        vals = jax.vmap(child_value)(actions)
    # Root is always a max node (perspective == me).
    return jnp.argmax(jnp.where(state.legal, vals, -_BIG)).astype(jnp.int32)


def maximin_policy(max_search_depth: int, cfg: EnvConfig):
    @functools.wraps(maximin_action)
    def act(key, state):
        del key
        return maximin_action(state, cfg, max_search_depth)
    return act


def make_policy(name: str, cfg: EnvConfig, search_depth: int = 1):
    """Policy factory mirroring ``create_policy`` (run.py:11-25) for the
    scripted zoo.  Returns ``act(key, state) -> action``."""
    if name == "rand":
        return random_policy
    if name == "greedy":
        return greedy_policy
    if name == "maximin":
        return maximin_policy(search_depth, cfg)
    raise ValueError(f"unknown scripted policy: {name!r}")
