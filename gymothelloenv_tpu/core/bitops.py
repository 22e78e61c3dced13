"""Plane-shift primitives for the batched Othello rules engine.

A board is a pair of boolean "disk planes" (``mine``, ``opp``) of shape
``(..., B, B)``.  Every rules computation (legal-move masks, flip resolution,
greedy flip counts) is expressed as a fixed, statically-unrolled sequence of
translated-plane AND/OR algebra (a "dumb7fill" flood), which XLA fuses into a
handful of vector ops on TPU.  This replaces the reference's per-cell Python
ray scans (``/root/reference/othello.py:273-343``) with shape-static,
data-independent code that runs identically for every game in the batch.
"""

from __future__ import annotations

import jax.numpy as jnp

# The 8 scan directions (row delta, col delta), matching the nested loops in
# the reference (othello.py:398-400 / :324-340).
DIRECTIONS = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)


def shift(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Translate a plane by ``(dr, dc)``, zero-filling at the edges.

    ``out[..., r, c] = x[..., r - dr, c - dc]`` (i.e. the set of marked cells
    moves *in* direction ``(dr, dc)``).  ``dr``/``dc`` must be -1, 0 or +1.
    """
    B = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad)
    return xp[..., 1 - dr:1 - dr + B, 1 - dc:1 - dc + B]


def legal_mask(mine: jnp.ndarray, opp: jnp.ndarray) -> jnp.ndarray:
    """Boolean plane of legal placements for the ``mine`` player.

    A cell is legal iff it is empty and, in at least one direction ``d``,
    the ray ``cell+d, cell+2d, ...`` passes through >=1 ``opp`` disk and then
    hits a ``mine`` disk (othello.py:273-343 semantics).

    Shapes: ``mine``, ``opp`` are boolean ``(..., B, B)``; returns the same.
    """
    B = mine.shape[-1]
    empty = ~(mine | opp)
    legal = jnp.zeros_like(empty)
    for dr, dc in DIRECTIONS:
        # t = opp cells that start a run (read along -d) ending in a mine disk.
        t = opp & shift(mine, -dr, -dc)
        # Extend to runs of up to B-2 opponent disks.
        for _ in range(B - 3):
            t = t | (opp & shift(t, -dr, -dc))
        legal = legal | (empty & shift(t, -dr, -dc))
    return legal


def flip_counts(mine: jnp.ndarray, opp: jnp.ndarray) -> jnp.ndarray:
    """Per-cell number of opponent disks that a placement would flip.

    Returns an int32 plane ``(..., B, B)``; the value is only meaningful at
    empty cells (``legal ⟺ empty & (flip_counts > 0)``).  Used by the greedy
    policy (1-ply disk-count maximization, simple_policies.py:69-92) without
    replaying moves on scratch environments.
    """
    B = mine.shape[-1]
    counts = jnp.zeros(mine.shape, jnp.int32)
    # s_j = cells p such that p..p+(j-1)d are all opp and p+jd is mine.
    for dr, dc in DIRECTIONS:
        s = opp & shift(mine, -dr, -dc)
        for j in range(1, B - 1):
            counts = counts + j * shift(s, -dr, -dc).astype(jnp.int32)
            if j < B - 2:
                s = opp & shift(s, -dr, -dc)
    return counts


def resolve_flips(onehot: jnp.ndarray, mine: jnp.ndarray,
                  opp: jnp.ndarray) -> jnp.ndarray:
    """Plane of opponent disks flipped by placing at the ``onehot`` cell.

    ``onehot`` marks exactly one cell per board.  For each direction, flood
    the consecutive run of opponent disks adjacent to the placement and keep
    it only if the run is terminated by one of our disks
    (othello.py:391-407 semantics).  Returns a boolean ``(..., B, B)`` plane.
    """
    B = mine.shape[-1]
    flips = jnp.zeros_like(mine)
    for dr, dc in DIRECTIONS:
        f = shift(onehot, dr, dc) & opp
        for _ in range(B - 3):
            f = f | (shift(f, dr, dc) & opp)
        # Only the far end of the run can touch a non-opp cell, so this
        # detects "run terminated by a mine disk".
        valid = (shift(f, dr, dc) & mine).any(axis=(-2, -1), keepdims=True)
        flips = flips | (f & valid)
    return flips


def apply_move(onehot: jnp.ndarray, mine: jnp.ndarray, opp: jnp.ndarray):
    """Apply a (presumed legal) placement; returns updated ``(mine, opp)``."""
    flips = resolve_flips(onehot, mine, opp)
    return mine | onehot | flips, opp & ~flips
