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
from flax import struct

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


# ---------------------------------------------------------------------------
# Bitboard-native game state: the whole transition on packed words, no
# plane pack/unpack per step.  ``core.state._step_bitboard`` routes through
# ``bit_step`` (single source of truth for the 8x8 rules); the bit-native
# vector env (envs/bit_vector_env.py) keeps this representation across a
# whole rollout, which is what the headline bench measures.
# ---------------------------------------------------------------------------

@struct.dataclass
class BitState:
    """8x8 game state on packed bitboards.  Shapes shown unbatched; batch by
    vmapping or by calling the (shape-polymorphic) fns on leading dims."""
    black: jnp.ndarray       # uint32 (..., 2) black disks
    white: jnp.ndarray       # uint32 (..., 2) white disks
    turn: jnp.ndarray        # int8 (...,) player to move (last mover if done)
    legal: jnp.ndarray       # uint32 (..., 2) legal placements for `turn`
    terminated: jnp.ndarray  # bool (...)
    winner: jnp.ndarray      # int8 (...,)


@struct.dataclass
class BitStepResult:
    state: BitState
    reward: jnp.ndarray      # float32 (...,) mover-perspective terminal
    done: jnp.ndarray        # bool (...,)


def bit_reset(batch_shape=()) -> BitState:
    """Standard opening, black to move (othello.py:256-271).  Cells d4/e5
    white, d5/e4 black: bits 27/36 white, 28/35 black."""
    black = jnp.broadcast_to(
        jnp.asarray([np.uint32(1) << 28, np.uint32(1) << 3], jnp.uint32),
        batch_shape + (2,))
    white = jnp.broadcast_to(
        jnp.asarray([np.uint32(1) << 27, np.uint32(1) << 4], jnp.uint32),
        batch_shape + (2,))
    return BitState(
        black=black, white=white,
        turn=jnp.full(batch_shape, -1, jnp.int8),
        legal=legal_mask(black, white),
        terminated=jnp.zeros(batch_shape, bool),
        winner=jnp.zeros(batch_shape, jnp.int8))


def bit_step(state: BitState, action: jnp.ndarray,
             sudden_death_on_invalid_move: bool = True,
             num_disk_as_reward: bool = False) -> BitStepResult:
    """One ply on bitboards, bit-exact with ``OthelloBaseEnv.step``
    (othello.py:412-462; see core/state.step for the semantics list).
    Shape-polymorphic over leading batch dims."""
    mover = state.turn
    is_white = (mover[..., None] == 1)
    mine = jnp.where(is_white, state.white, state.black)
    opp = jnp.where(is_white, state.black, state.white)

    onehot = action_bit(action)
    valid = any_bits(state.legal & onehot)

    flips = resolve_flips(onehot, mine, opp)
    new_mine = mine | onehot | flips
    new_opp = opp & ~flips
    mine = jnp.where(valid[..., None], new_mine, mine)
    opp = jnp.where(valid[..., None], new_opp, opp)

    board_full = popcount(mine | opp) == 64
    if sudden_death_on_invalid_move:
        sudden = ~valid
    else:
        sudden = jnp.zeros_like(valid)
    done_now = sudden | board_full

    legal_opp_bb = legal_mask(opp, mine)
    legal_same_bb = legal_mask(mine, opp)
    opp_has = any_bits(legal_opp_bb)
    same_has = any_bits(legal_same_bb)
    stuck = ~opp_has & ~same_has
    terminated = done_now | stuck

    next_turn = jnp.where(terminated, mover,
                          jnp.where(opp_has, -mover, mover)).astype(jnp.int8)
    next_legal = jnp.where(
        terminated[..., None], jnp.zeros_like(legal_opp_bb),
        jnp.where(opp_has[..., None], legal_opp_bb, legal_same_bb))

    mine_cnt = popcount(mine)
    opp_cnt = popcount(opp)
    white_cnt = jnp.where(mover == 1, mine_cnt, opp_cnt)
    black_cnt = jnp.where(mover == 1, opp_cnt, mine_cnt)
    count_winner = jnp.sign(white_cnt - black_cnt).astype(jnp.int8)
    winner = jnp.where(
        terminated,
        jnp.where(sudden, (-mover).astype(jnp.int8), count_winner),
        jnp.int8(0))

    if num_disk_as_reward:
        disk_reward = (mine_cnt - opp_cnt).astype(jnp.float32)
        disk_reward = jnp.where(opp_cnt == 0, jnp.float32(64.0),
                                disk_reward)
        reward = jnp.where(sudden, jnp.float32(-64.0), disk_reward)
    else:
        reward = (winner * mover).astype(jnp.float32)
    reward = jnp.where(terminated, reward, jnp.float32(0.0))

    new_black = jnp.where(is_white, opp, mine)
    new_white = jnp.where(is_white, mine, opp)
    return BitStepResult(
        state=BitState(black=new_black, white=new_white, turn=next_turn,
                       legal=next_legal, terminated=terminated,
                       winner=winner),
        reward=reward, done=terminated)


def random_legal_bit(key: jax.Array, legal: jnp.ndarray) -> jnp.ndarray:
    """Uniform random set bit of each legal bitboard -> flat action int32.

    One randint per board plus a 5-step prefix-popcount binary search —
    replaces the (N, 64)-gumbel categorical sampler in the hot rollout
    (64x fewer random bits, no logs).  Boards with no legal move return an
    arbitrary index (caller masks/reset).
    """
    count = popcount(legal)
    t = jax.random.randint(key, count.shape, 0,
                           jnp.maximum(count, 1), dtype=jnp.int32)
    n0 = jax.lax.population_count(legal[..., 0]).astype(jnp.int32)
    in_w1 = t >= n0
    t = jnp.where(in_w1, t - n0, t)
    w = jnp.where(in_w1, legal[..., 1], legal[..., 0])
    pos = jnp.zeros_like(t)
    for width in (16, 8, 4, 2, 1):
        mask = (((np.uint32(1) << np.uint32(width)) - np.uint32(1))
                << pos.astype(jnp.uint32))
        cnt = jax.lax.population_count(w & mask).astype(jnp.int32)
        skip = t >= cnt
        pos = jnp.where(skip, pos + width, pos)
        t = jnp.where(skip, t - cnt, t)
    return jnp.where(in_w1, pos + 32, pos)


def from_planes(board: jnp.ndarray, turn: jnp.ndarray,
                legal_plane: jnp.ndarray, terminated: jnp.ndarray,
                winner: jnp.ndarray) -> BitState:
    """Plane-state fields -> BitState (board int8 (..., 8, 8), legal flat
    bool (..., 64))."""
    return BitState(
        black=pack(board == -1), white=pack(board == 1), turn=turn,
        legal=pack(legal_plane.reshape(legal_plane.shape[:-1] + (8, 8))),
        terminated=terminated, winner=winner)


def to_board(state: BitState) -> jnp.ndarray:
    """BitState -> signed int8 board (..., 8, 8)."""
    black = unpack(state.black)
    white = unpack(state.white)
    return (white.astype(jnp.int8) - black.astype(jnp.int8))
