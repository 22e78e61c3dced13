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


def _pad_pow2(arr: np.ndarray) -> np.ndarray:
    """Zero-pad to the next power-of-two length so the jitted level
    programs compile once per size bucket instead of once per exact
    frontier size.  All-zero padded positions have no legal moves and
    are never expanded."""
    n = arr.shape[0]
    target = 1 << max(0, (n - 1).bit_length())
    if target == n:
        return arr
    return np.concatenate([arr, np.zeros(target - n, arr.dtype)])


def _expand_level(frontier):
    """One BFS level: (cur0, cur1, opp0, opp1) numpy arrays -> children
    arrays (or None when no position has a move)."""
    padded = tuple(_pad_pow2(x) for x in frontier)
    c0, c1, o0, o1, legal, _ = (
        np.asarray(x) for x in _level_masks(
            *(jnp.asarray(x) for x in padded)))
    pos_idx, actions = np.nonzero(legal)
    if pos_idx.size == 0:
        return None
    take = _pad_pow2(pos_idx.astype(np.int64))
    children = _apply_moves(
        jnp.asarray(c0[take]), jnp.asarray(c1[take]),
        jnp.asarray(o0[take]), jnp.asarray(o1[take]),
        jnp.asarray(_pad_pow2(actions.astype(np.int32))))
    return (tuple(np.asarray(x)[:pos_idx.size] for x in children),
            pos_idx.size)


def perft(depth: int, max_positions: int = 50_000_000) -> int:
    """Number of distinct ``depth``-placement sequences from the opening.

    Raises if the frontier would exceed ``max_positions`` (depth 9 is
    ~3M positions; depth 11+ grows beyond typical host memory)."""
    black = np.array([1 << 28, 1 << 3], np.uint32)     # words of e4|d5
    white = np.array([1 << 27, 1 << 4], np.uint32)     # words of d4|e5
    return perft_from((black[0], black[1]), (white[0], white[1]), depth,
                      max_positions)


def perft_from(cur_pair, opp_pair, depth: int,
               max_positions: int = 50_000_000) -> int:
    """Perft from an arbitrary packed position (word pairs as in
    core.bitboard; ``cur`` is the side to move)."""
    frontier = (np.array([cur_pair[0]], np.uint32),
                np.array([cur_pair[1]], np.uint32),
                np.array([opp_pair[0]], np.uint32),
                np.array([opp_pair[1]], np.uint32))
    count = 1
    for level in range(depth):
        out = _expand_level(frontier)
        if out is None:
            return 0
        frontier, count = out
        if count > max_positions:
            raise ValueError(
                f"perft frontier {count} exceeds max_positions")
    return count
