"""Bitboard rules kernel for 8x8 boards.

Each player's disks pack into 2 uint32 words (bit ``k`` of word ``w`` =
cell ``w*32 + k``, row-major), so every flood iteration is a handful of
integer ops on word arrays instead of ~50 elementwise ops on ``(..., 8, 8)``
planes — ~8x less data movement than core/bitops.py, which remains the
reference implementation (and the only path for other board sizes).
``core.state.step`` dispatches here for ``board_size == 8``;
cross-validated against the plane kernel and the golden reference
transcripts by the rules test-suite.

Layout note (TPU): the hot path works on PAIRS of flat ``(N,)`` uint32
arrays (``w0, w1``), never on ``(N, 2)`` stacks.  A ``(N, 2)`` array tiles
on TPU as (8, 128) blocks with only 2 of 128 lanes populated (~1.5% lane
utilization and 64x padded VMEM footprint); two flat ``(N,)`` arrays tile
densely.  The ``(N, 2)``-stacked helpers are kept as thin wrappers for
conversion boundaries and tests.
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


def pack2(plane: jnp.ndarray):
    """bool/int (..., 8, 8) -> word pair ((...,), (...,)) uint32."""
    packed = pack(plane)
    return packed[..., 0], packed[..., 1]


def unpack2(pair) -> jnp.ndarray:
    """Word pair -> bool (..., 8, 8)."""
    return unpack(jnp.stack(pair, axis=-1))


# Column masks for k-step horizontal shifts: shifting left by k wraps the
# low k columns of each byte-row (clear them); right shifts wrap the high k.
_COL_HI = {1: np.uint32(0xFEFEFEFE), 2: np.uint32(0xFCFCFCFC),
           4: np.uint32(0xF0F0F0F0)}
_COL_LO = {1: np.uint32(0x7F7F7F7F), 2: np.uint32(0x3F3F3F3F),
           4: np.uint32(0x0F0F0F0F)}


def shift2k(w0: jnp.ndarray, w1: jnp.ndarray, dr: int, dc: int, k: int):
    """Translate the bit set by k*(dr, dc) cells, dropping bits at the
    edges.  ``w0``/``w1``: uint32 (...,) [rows 0-3, rows 4-7]; k in
    {1, 2, 4}.  The k == 4 vertical move is a free word swap."""
    if dc == 1:
        w0 = (w0 << np.uint32(k)) & _COL_HI[k]
        w1 = (w1 << np.uint32(k)) & _COL_HI[k]
    elif dc == -1:
        w0 = (w0 >> np.uint32(k)) & _COL_LO[k]
        w1 = (w1 >> np.uint32(k)) & _COL_LO[k]
    b = 8 * k
    if dr == 1:
        if k == 4:
            w0, w1 = jnp.zeros_like(w0), w0
        else:
            w0, w1 = w0 << np.uint32(b), \
                (w1 << np.uint32(b)) | (w0 >> np.uint32(32 - b))
    elif dr == -1:
        if k == 4:
            w0, w1 = w1, jnp.zeros_like(w1)
        else:
            w0, w1 = (w0 >> np.uint32(b)) | (w1 << np.uint32(32 - b)), \
                w1 >> np.uint32(b)
    return w0, w1


def shift2(w0: jnp.ndarray, w1: jnp.ndarray, dr: int, dc: int):
    """Single-cell translate (see shift2k)."""
    return shift2k(w0, w1, dr, dc, 1)


def _fill2(g, p, dr, dc):
    """Kogge-Stone occluded flood: the ``p`` cells reachable from a ``g``
    cell by repeated (dr, dc) steps through ``p`` (three doubling levels
    cover the max run of 6 on 8x8; same result as the 6-step dumb7fill).
    """
    g0, g1 = g
    p0, p1 = p
    s0, s1 = shift2k(g0, g1, dr, dc, 1)
    g0, g1 = g0 | (p0 & s0), g1 | (p1 & s1)
    q0, q1 = shift2k(p0, p1, dr, dc, 1)
    r0, r1 = p0 & q0, p1 & q1                 # runs of >= 2 propagate
    s0, s1 = shift2k(g0, g1, dr, dc, 2)
    g0, g1 = g0 | (r0 & s0), g1 | (r1 & s1)
    q0, q1 = shift2k(r0, r1, dr, dc, 2)
    r0, r1 = r0 & q0, r1 & q1                 # runs of >= 4 propagate
    s0, s1 = shift2k(g0, g1, dr, dc, 4)
    g0, g1 = g0 | (r0 & s0), g1 | (r1 & s1)
    return g0 & p[0], g1 & p[1]


def legal_mask2(m, o):
    """Legal placements for word pair ``m`` vs ``o`` (8-direction occluded
    flood; bitops.legal_mask / othello.py:273-343 semantics)."""
    e0 = ~(m[0] | o[0])
    e1 = ~(m[1] | o[1])
    l0 = jnp.zeros_like(m[0])
    l1 = jnp.zeros_like(m[1])
    for dr, dc in DIRECTIONS:
        t0, t1 = _fill2(m, o, dr, dc)
        s0, s1 = shift2k(t0, t1, dr, dc, 1)
        l0 = l0 | (e0 & s0)
        l1 = l1 | (e1 & s1)
    return l0, l1


def resolve_flips2(a, m, o):
    """Disks flipped by placing at the (single-bit) pair ``a``."""
    m0, m1 = m
    flips0 = jnp.zeros_like(m0)
    flips1 = jnp.zeros_like(m1)
    zero = jnp.zeros_like(m0)
    for dr, dc in DIRECTIONS:
        f0, f1 = _fill2(a, o, dr, dc)
        s0, s1 = shift2k(f0, f1, dr, dc, 1)
        valid = ((s0 & m0) | (s1 & m1)) != 0
        flips0 = flips0 | jnp.where(valid, f0, zero)
        flips1 = flips1 | jnp.where(valid, f1, zero)
    return flips0, flips1


def popcount2(pair) -> jnp.ndarray:
    """Number of set bits in a word pair, int32 (...,)."""
    return (jax.lax.population_count(pair[0])
            + jax.lax.population_count(pair[1])).astype(jnp.int32)


def any2(pair) -> jnp.ndarray:
    return (pair[0] | pair[1]) != 0


def action_bit2(action: jnp.ndarray):
    """Flat action index -> single-bit word pair.  Out-of-range actions
    (e.g. 64) map to the empty pair (treated as illegal downstream)."""
    word = action // 32
    bit = np.uint32(1) << (action % 32).astype(jnp.uint32)
    zero = jnp.zeros_like(bit)
    return jnp.where(word == 0, bit, zero), jnp.where(word == 1, bit, zero)


# --- (., 2)-stacked wrappers (conversion boundaries, tests, pallas parity)

def _split(x: jnp.ndarray):
    return x[..., 0], x[..., 1]


def shift(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Stacked-layout ``shift2``: uint32 (..., 2) -> (..., 2)."""
    return jnp.stack(shift2(*_split(x), dr, dc), axis=-1)


def popcount(bb: jnp.ndarray) -> jnp.ndarray:
    """Number of set bits, int32 (...,)."""
    return jax.lax.population_count(bb).sum(axis=-1).astype(jnp.int32)


def any_bits(bb: jnp.ndarray) -> jnp.ndarray:
    return (bb != 0).any(axis=-1)


def legal_mask(mine: jnp.ndarray, opp: jnp.ndarray) -> jnp.ndarray:
    """Stacked-layout ``legal_mask2``: (..., 2) bitboards."""
    return jnp.stack(legal_mask2(_split(mine), _split(opp)), axis=-1)


def resolve_flips(onehot: jnp.ndarray, mine: jnp.ndarray,
                  opp: jnp.ndarray) -> jnp.ndarray:
    """Stacked-layout ``resolve_flips2``: (..., 2) bitboards."""
    return jnp.stack(
        resolve_flips2(_split(onehot), _split(mine), _split(opp)), axis=-1)


def action_bit(action: jnp.ndarray) -> jnp.ndarray:
    """Flat action index -> single-bit bitboard (..., 2)."""
    return jnp.stack(action_bit2(action), axis=-1)


# ---------------------------------------------------------------------------
# Bitboard-native game state: the whole transition on packed words, no
# plane pack/unpack per step.  ``core.state._step_bitboard`` routes through
# ``bit_step`` (single source of truth for the 8x8 rules); the bit-native
# vector env (envs/bit_vector_env.py) keeps this representation across a
# whole rollout, which is what the headline bench measures.
# ---------------------------------------------------------------------------

@struct.dataclass
class BitState:
    """8x8 game state on packed bitboards.  Each bitboard is a word PAIR
    ``(w0, w1)`` of uint32 (...,) arrays (see module layout note).  Shapes
    shown unbatched; all fns are shape-polymorphic over leading dims."""
    black: tuple             # (uint32 (...,), uint32 (...,)) black disks
    white: tuple             # word pair, white disks
    turn: jnp.ndarray        # int8 (...,) player to move (last mover if done)
    legal: tuple             # word pair, legal placements for `turn`
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
    def full(v):
        return jnp.full(batch_shape, v, jnp.uint32)

    black = (full(np.uint32(1) << 28), full(np.uint32(1) << 3))
    white = (full(np.uint32(1) << 27), full(np.uint32(1) << 4))
    return BitState(
        black=black, white=white,
        turn=jnp.full(batch_shape, -1, jnp.int8),
        legal=legal_mask2(black, white),
        terminated=jnp.zeros(batch_shape, bool),
        winner=jnp.zeros(batch_shape, jnp.int8))


def bit_step(state: BitState, action: jnp.ndarray,
             sudden_death_on_invalid_move: bool = True,
             num_disk_as_reward: bool = False) -> BitStepResult:
    """One ply on bitboards, bit-exact with ``OthelloBaseEnv.step``
    (othello.py:412-462; see core/state.step for the semantics list).
    Shape-polymorphic over leading batch dims."""
    mover = state.turn
    is_white = mover == 1

    def sel(cond, a, b):
        return (jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1]))

    mine = sel(is_white, state.white, state.black)
    opp = sel(is_white, state.black, state.white)

    onehot = action_bit2(action)
    valid = (state.legal[0] & onehot[0]) | (state.legal[1] & onehot[1])
    valid = valid != 0

    flips = resolve_flips2(onehot, mine, opp)
    new_mine = (mine[0] | onehot[0] | flips[0],
                mine[1] | onehot[1] | flips[1])
    new_opp = (opp[0] & ~flips[0], opp[1] & ~flips[1])
    mine = sel(valid, new_mine, mine)
    opp = sel(valid, new_opp, opp)

    board_full = popcount2((mine[0] | opp[0], mine[1] | opp[1])) == 64
    if sudden_death_on_invalid_move:
        sudden = ~valid
    else:
        sudden = jnp.zeros_like(valid)
    done_now = sudden | board_full

    legal_opp_bb = legal_mask2(opp, mine)
    legal_same_bb = legal_mask2(mine, opp)
    opp_has = any2(legal_opp_bb)
    same_has = any2(legal_same_bb)
    stuck = ~opp_has & ~same_has
    terminated = done_now | stuck

    next_turn = jnp.where(terminated, mover,
                          jnp.where(opp_has, -mover, mover)).astype(jnp.int8)
    zero = jnp.zeros_like(legal_opp_bb[0])
    keep = ~terminated
    next_legal = (
        jnp.where(keep & opp_has, legal_opp_bb[0],
                  jnp.where(keep, legal_same_bb[0], zero)),
        jnp.where(keep & opp_has, legal_opp_bb[1],
                  jnp.where(keep, legal_same_bb[1], zero)))

    mine_cnt = popcount2(mine)
    opp_cnt = popcount2(opp)
    white_cnt = jnp.where(is_white, mine_cnt, opp_cnt)
    black_cnt = jnp.where(is_white, opp_cnt, mine_cnt)
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

    new_black = sel(is_white, opp, mine)
    new_white = sel(is_white, mine, opp)
    return BitStepResult(
        state=BitState(black=new_black, white=new_white, turn=next_turn,
                       legal=next_legal, terminated=terminated,
                       winner=winner),
        reward=reward, done=terminated)


def random_legal_bit(key: jax.Array, legal) -> jnp.ndarray:
    """Uniform random set bit of each legal word pair -> flat action int32.

    One randint per board plus a 5-step prefix-popcount binary search —
    replaces the (N, 64)-gumbel categorical sampler in the hot rollout
    (64x fewer random bits, no logs).  Boards with no legal move return an
    arbitrary index (caller masks/reset).
    """
    count = popcount2(legal)
    t = jax.random.randint(key, count.shape, 0,
                           jnp.maximum(count, 1), dtype=jnp.int32)
    n0 = jax.lax.population_count(legal[0]).astype(jnp.int32)
    in_w1 = t >= n0
    t = jnp.where(in_w1, t - n0, t)
    w = jnp.where(in_w1, legal[1], legal[0])
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
        black=pack2(board == -1), white=pack2(board == 1), turn=turn,
        legal=pack2(legal_plane.reshape(legal_plane.shape[:-1] + (8, 8))),
        terminated=terminated, winner=winner)


def to_board(state: BitState) -> jnp.ndarray:
    """BitState -> signed int8 board (..., 8, 8)."""
    black = unpack2(state.black)
    white = unpack2(state.white)
    return (white.astype(jnp.int8) - black.astype(jnp.int8))
