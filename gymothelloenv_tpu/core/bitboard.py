"""Bitboard rules kernel for 8x8 boards.

Each player's disks pack into 2 uint32 words (bit ``k`` of word ``w`` =
cell ``w*32 + k``, row-major), so every flood iteration is a handful of
integer ops on ``(..., 2)`` uint32 arrays instead of ~50 elementwise ops on
``(..., 8, 8)`` planes — ~8x less data movement than core/bitops.py, which
remains the reference implementation (and the only path for other board
sizes).  ``core.state.step`` dispatches here for ``board_size == 8``;
cross-validated against the plane kernel and the golden reference
transcripts by the rules test-suite.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy scalars on purpose: module-level jnp scalars become lifted jaxpr
# constants in every program that traces these ops, and jax 0.9 mishandles
# lifted consts on re-dispatch of sharded programs (CLAUDE.md).
_NOT_COL0 = np.uint32(0xFEFEFEFE)   # clears bits with c == 0
_NOT_COL7 = np.uint32(0x7F7F7F7F)   # clears bits with c == 7

DIRECTIONS = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)


def pack(plane: jnp.ndarray) -> jnp.ndarray:
    """bool/int (..., 8, 8) -> uint32 (..., 2)."""
    bits = plane.reshape(plane.shape[:-2] + (2, 32)).astype(jnp.uint32)
    weights = np.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    return (bits * weights).sum(axis=-1, dtype=jnp.uint32)


def unpack(bb: jnp.ndarray) -> jnp.ndarray:
    """uint32 (..., 2) -> bool (..., 8, 8)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (bb[..., None] >> shifts) & np.uint32(1)
    return (bits != 0).reshape(bb.shape[:-1] + (8, 8))


def shift(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Translate the bit set by (dr, dc), dropping bits at the edges.
    ``x``: uint32 (..., 2) [rows 0-3, rows 4-7]."""
    # Horizontal: +-1 bit within each byte-row.
    if dc == 1:
        x = (x << np.uint32(1)) & _NOT_COL0
    elif dc == -1:
        x = (x >> np.uint32(1)) & _NOT_COL7
    # Vertical: +-8 bits with carry between the two words.
    w0, w1 = x[..., 0], x[..., 1]
    if dr == 1:
        w0, w1 = w0 << np.uint32(8), \
            (w1 << np.uint32(8)) | (w0 >> np.uint32(24))
    elif dr == -1:
        w0, w1 = (w0 >> np.uint32(8)) | (w1 << np.uint32(24)), \
            w1 >> np.uint32(8)
    return jnp.stack([w0, w1], axis=-1)


def popcount(bb: jnp.ndarray) -> jnp.ndarray:
    """Number of set bits, int32 (...,)."""
    return jax.lax.population_count(bb).sum(axis=-1).astype(jnp.int32)


def any_bits(bb: jnp.ndarray) -> jnp.ndarray:
    return (bb != 0).any(axis=-1)


def legal_mask(mine: jnp.ndarray, opp: jnp.ndarray) -> jnp.ndarray:
    """Legal placements for ``mine`` as a bitboard (same flood as
    bitops.legal_mask, othello.py:273-343 semantics)."""
    empty = ~(mine | opp)
    legal = jnp.zeros_like(mine)
    for dr, dc in DIRECTIONS:
        t = opp & shift(mine, -dr, -dc)
        for _ in range(5):
            t = t | (opp & shift(t, -dr, -dc))
        legal = legal | (empty & shift(t, -dr, -dc))
    return legal


def resolve_flips(onehot: jnp.ndarray, mine: jnp.ndarray,
                  opp: jnp.ndarray) -> jnp.ndarray:
    """Disks flipped by placing at the (single-bit) ``onehot`` cell."""
    flips = jnp.zeros_like(mine)
    for dr, dc in DIRECTIONS:
        f = shift(onehot, dr, dc) & opp
        for _ in range(5):
            f = f | (shift(f, dr, dc) & opp)
        valid = any_bits(shift(f, dr, dc) & mine)
        flips = flips | jnp.where(valid[..., None], f,
                                  jnp.zeros_like(f))
    return flips


def action_bit(action: jnp.ndarray) -> jnp.ndarray:
    """Flat action index -> single-bit bitboard (..., 2)."""
    word = (action // 32)[..., None]
    bit = (action % 32)[..., None].astype(jnp.uint32)
    return jnp.where(jnp.arange(2) == word,
                     np.uint32(1) << bit, np.uint32(0))
