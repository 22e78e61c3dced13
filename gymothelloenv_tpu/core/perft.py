"""Perft over the JAX bitboard engine — exhaustive rule validation.

``perft(depth)`` counts every distinct sequence of ``depth`` disk
placements from the standard opening using the SAME primitives the
framework's 8x8 fast path runs on (``core.bitboard`` legal masks and flip
resolution), via batched breadth-first expansion: each level computes the
legal mask for every frontier position in one vmapped program and expands
on the host.  tests/test_perft.py cross-checks the counts against an
independent native C++ engine (native/othello_perft.cpp) — agreement at
depth d means the two rule implementations agree on every one of the
millions of reachable positions, a far denser check than recorded games.

Pass convention (matches the engine, othello.py:436-442): a forced pass
swaps the mover without consuming depth; a position where neither side
can move is terminal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import bitboard as bb


@functools.partial(jax.jit, static_argnames=())
def _level_masks(cur0, cur1, opp0, opp1):
    """For each frontier position: resolve forced passes, then return the
    (possibly swapped) position, its legal mask as (N, 64) bool, and a
    live flag (False when neither side can move)."""
    legal = bb.legal_mask2((cur0, cur1), (opp0, opp1))
    has_move = bb.any2(legal)
    legal_opp = bb.legal_mask2((opp0, opp1), (cur0, cur1))
    opp_has = bb.any2(legal_opp)

    swap = (~has_move) & opp_has
    live = has_move | opp_has

    n_cur0 = jnp.where(swap, opp0, cur0)
    n_cur1 = jnp.where(swap, opp1, cur1)
    n_opp0 = jnp.where(swap, cur0, opp0)
    n_opp1 = jnp.where(swap, cur1, opp1)
    n_legal0 = jnp.where(swap, legal_opp[0], legal[0])
    n_legal1 = jnp.where(swap, legal_opp[1], legal[1])
    legal_planes = bb.unpack2((n_legal0, n_legal1)).reshape(-1, 64)
    return (n_cur0, n_cur1, n_opp0, n_opp1,
            legal_planes & live[:, None], live)


@functools.partial(jax.jit, static_argnames=())
def _apply_moves(cur0, cur1, opp0, opp1, actions):
    """Play ``actions[i]`` on position i; returns the CHILD position with
    the mover swapped (next side to move first)."""
    move = bb.action_bit2(actions)
    flips = bb.resolve_flips2(move, (cur0, cur1), (opp0, opp1))
    new_mine0 = cur0 | flips[0] | move[0]
    new_mine1 = cur1 | flips[1] | move[1]
    new_opp0 = opp0 ^ flips[0]
    new_opp1 = opp1 ^ flips[1]
    return new_opp0, new_opp1, new_mine0, new_mine1


def perft(depth: int, max_positions: int = 50_000_000) -> int:
    """Number of distinct ``depth``-placement sequences from the opening.

    Raises if the frontier would exceed ``max_positions`` (depth 9 is
    ~3M positions; depth 11+ grows beyond typical host memory)."""
    black = np.array([1 << 28, 1 << 3], np.uint32)     # words of e4|d5
    white = np.array([1 << 27, 1 << 4], np.uint32)     # words of d4|e5
    cur0 = np.array([black[0]], np.uint32)
    cur1 = np.array([black[1]], np.uint32)
    opp0 = np.array([white[0]], np.uint32)
    opp1 = np.array([white[1]], np.uint32)

    for level in range(depth):
        c0, c1, o0, o1, legal, live = (
            np.asarray(x) for x in _level_masks(
                jnp.asarray(cur0), jnp.asarray(cur1),
                jnp.asarray(opp0), jnp.asarray(opp1)))
        pos_idx, actions = np.nonzero(legal)
        if pos_idx.size == 0:
            return 0
        if pos_idx.size > max_positions:
            raise ValueError(
                f"perft frontier {pos_idx.size} exceeds max_positions")
        children = _apply_moves(
            jnp.asarray(c0[pos_idx]), jnp.asarray(c1[pos_idx]),
            jnp.asarray(o0[pos_idx]), jnp.asarray(o1[pos_idx]),
            jnp.asarray(actions.astype(np.int32)))
        cur0, cur1, opp0, opp1 = (np.asarray(x) for x in children)

    return int(cur0.shape[0])


def perft_from(cur_pair, opp_pair, depth: int) -> int:
    """Perft from an arbitrary packed position (word pairs as in
    core.bitboard; ``cur`` is the side to move)."""
    frontier = (np.array([cur_pair[0]], np.uint32),
                np.array([cur_pair[1]], np.uint32),
                np.array([opp_pair[0]], np.uint32),
                np.array([opp_pair[1]], np.uint32))
    for level in range(depth):
        c0, c1, o0, o1, legal, live = (
            np.asarray(x) for x in _level_masks(
                *(jnp.asarray(x) for x in frontier)))
        pos_idx, actions = np.nonzero(legal)
        if pos_idx.size == 0:
            return 0
        children = _apply_moves(
            jnp.asarray(c0[pos_idx]), jnp.asarray(c1[pos_idx]),
            jnp.asarray(o0[pos_idx]), jnp.asarray(o1[pos_idx]),
            jnp.asarray(actions.astype(np.int32)))
        frontier = tuple(np.asarray(x) for x in children)
    return int(frontier[0].shape[0])
