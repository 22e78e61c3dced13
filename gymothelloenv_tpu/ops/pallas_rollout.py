"""Fused whole-rollout Pallas TPU kernel: batched random self-play with the
ENTIRE step loop inside one kernel.

The jitted ``lax.scan`` rollout (bench.py / envs/bit_vector_env.py) pays
per-step XLA kernel-dispatch overhead that dwarfs the ~4us of integer VPU
work an 8x8 bitboard step actually needs at batch 4096.  This kernel keeps
the whole game state resident in VMEM/vector registers and runs
``num_steps`` plies in a single ``fori_loop`` — zero dispatch between
plies, on-core PRNG (``pltpu.prng_random_bits``) for the random policy.

Semantics: every game plays uniformly-random legal moves (the headline
bench protocol, BASELINE.json configs[1]); terminal games auto-reset to
the opening.  Because actions are always legal, the only terminal condition
is "neither side can move" (board-full is a special case of it), matching
``bitboard.bit_step`` for legal actions (othello.py:412-442 semantics; the
sudden-death path is unreachable by construction).

State layout: the mover-perspective word pairs ``(cur, opp)`` plus the
mover's legal mask, each as an ``(8, N // 8)`` uint32 array — dense (8, 128)
TPU tiles (see core/bitboard.py layout note).  Flood fns are shared with
core/bitboard (``shift2``/``legal_mask2``/``resolve_flips2``), so the rules
stay single-source.

Parity: tests/test_pallas_rollout.py (interpret mode on CPU) checks state
invariants and episode statistics against the bit vector env.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gymothelloenv_tpu.core.bitboard import (legal_mask2, resolve_flips2)

ROWS = 8   # sublane dimension of the state arrays

# Opening constants (cur = black to move): disks on d5/e4 (bits 28, 35),
# opponent on d4/e5 (bits 27, 36); black's legal openings d3/c4/f5/e6
# (bits 19, 26, 37, 44).  Cross-checked against bitboard.bit_reset by the
# parity tests.
_INIT_C0 = np.uint32(1 << 28)
_INIT_C1 = np.uint32(1 << 3)
_INIT_O0 = np.uint32(1 << 27)
_INIT_O1 = np.uint32(1 << 4)
_INIT_L0 = np.uint32((1 << 19) | (1 << 26))
_INIT_L1 = np.uint32((1 << 5) | (1 << 12))


def _popcount(v: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount on uint32 (mosaic-safe; no lax.population_count)."""
    v = v - ((v >> np.uint32(1)) & np.uint32(0x55555555))
    v = ((v & np.uint32(0x33333333))
         + ((v >> np.uint32(2)) & np.uint32(0x33333333)))
    v = (v + (v >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
    return ((v * np.uint32(0x01010101)) >> np.uint32(24)).astype(jnp.int32)


def _sample_legal(r: jnp.ndarray, l0: jnp.ndarray, l1: jnp.ndarray):
    """Uniform random set bit of each legal pair -> onehot pair.
    ``r``: uint32 random bits.  Assumes every board has >= 1 legal bit."""
    cnt0 = _popcount(l0)
    cnt = cnt0 + _popcount(l1)
    # t = floor(u * cnt) with u ~ U[0,1) at 16-bit granularity (bias is
    # O(cnt / 2^16), invisible to the bench statistics).
    t = ((r >> np.uint32(16)).astype(jnp.int32) * cnt) >> 16
    in_w1 = t >= cnt0
    t = jnp.where(in_w1, t - cnt0, t)
    w = jnp.where(in_w1, l1, l0)
    pos = jnp.zeros_like(t)
    for width in (16, 8, 4, 2, 1):
        mask = (((np.uint32(1) << np.uint32(width)) - np.uint32(1))
                << pos.astype(jnp.uint32))
        cm = _popcount(w & mask)
        skip = t >= cm
        pos = jnp.where(skip, pos + width, pos)
        t = jnp.where(skip, t - cm, t)
    oh = np.uint32(1) << pos.astype(jnp.uint32)
    zero = jnp.zeros_like(oh)
    return jnp.where(in_w1, zero, oh), jnp.where(in_w1, oh, zero)


def _ply(c0, c1, o0, o1, l0, l1, r):
    """One random-move ply for every game; returns the next state pairs,
    next legal, and the done mask (games that just ended, pre-reset)."""
    oh0, oh1 = _sample_legal(r, l0, l1)
    f0, f1 = resolve_flips2((oh0, oh1), (c0, c1), (o0, o1))
    nc0, nc1 = c0 | oh0 | f0, c1 | oh1 | f1
    no0, no1 = o0 & ~f0, o1 & ~f1

    lo0, lo1 = legal_mask2((no0, no1), (nc0, nc1))   # opponent to move
    ls0, ls1 = legal_mask2((nc0, nc1), (no0, no1))   # mover again (pass)
    opp_has = (lo0 | lo1) != 0
    same_has = (ls0 | ls1) != 0
    done = ~opp_has & ~same_has   # board-full is a special case of stuck

    # Perspective swap unless the opponent must pass (othello.py:436-441),
    # then auto-reset finished games to the opening.
    def pick(sw, a, b, init):
        return jnp.where(done, init, jnp.where(sw, a, b))

    c0n = pick(opp_has, no0, nc0, _INIT_C0)
    c1n = pick(opp_has, no1, nc1, _INIT_C1)
    o0n = pick(opp_has, nc0, no0, _INIT_O0)
    o1n = pick(opp_has, nc1, no1, _INIT_O1)
    l0n = pick(opp_has, lo0, ls0, _INIT_L0)
    l1n = pick(opp_has, lo1, ls1, _INIT_L1)
    return c0n, c1n, o0n, o1n, l0n, l1n, done


def _make_kernel(num_steps: int):
    def kernel(seed_ref, c0_ref, c1_ref, o0_ref, o1_ref, l0_ref, l1_ref,
               oc0_ref, oc1_ref, oo0_ref, oo1_ref, ol0_ref, ol1_ref,
               eps_ref):
        pltpu.prng_seed(seed_ref[0, 0])

        def body(i, carry):
            c0, c1, o0, o1, l0, l1, ep = carry
            r = pltpu.bitcast(pltpu.prng_random_bits(c0.shape), jnp.uint32)
            c0, c1, o0, o1, l0, l1, done = _ply(c0, c1, o0, o1, l0, l1, r)
            return c0, c1, o0, o1, l0, l1, ep + done.astype(jnp.int32)

        init = (c0_ref[:], c1_ref[:], o0_ref[:], o1_ref[:],
                l0_ref[:], l1_ref[:],
                jnp.zeros(c0_ref.shape, jnp.int32))
        c0, c1, o0, o1, l0, l1, ep = jax.lax.fori_loop(
            0, num_steps, body, init)
        oc0_ref[:], oc1_ref[:] = c0, c1
        oo0_ref[:], oo1_ref[:] = o0, o1
        ol0_ref[:], ol1_ref[:] = l0, l1
        eps_ref[0, 0] = jnp.sum(ep)

    return kernel


@struct.dataclass
class RolloutState:
    """Mover-perspective rollout state, each field uint32 (8, N // 8)."""
    cur: tuple    # (c0, c1) current mover's disks
    opp: tuple    # (o0, o1) opponent's disks
    legal: tuple  # (l0, l1) mover's legal placements


def rollout_init(num_games: int) -> RolloutState:
    """All games at the opening (black to move)."""
    assert num_games % ROWS == 0
    shape = (ROWS, num_games // ROWS)

    def full(v):
        return jnp.full(shape, v, jnp.uint32)

    return RolloutState(cur=(full(_INIT_C0), full(_INIT_C1)),
                        opp=(full(_INIT_O0), full(_INIT_O1)),
                        legal=(full(_INIT_L0), full(_INIT_L1)))


def rollout_chunk_sharded(state: RolloutState, seed, num_steps: int,
                          mesh, axis: str = "data",
                          interpret: bool = False):
    """Fused rollout over every device of ``mesh``: the game batch's lane
    dimension is sharded over ``axis`` and each device runs its own kernel
    on its shard — env stepping is embarrassingly parallel, so the only
    collective is one ``psum`` for the episode count.  This is the
    multi-chip composition of the headline bench (each shard should keep a
    lane count that is a multiple of 128 for dense TPU tiles).  Per-device
    PRNG streams are decorrelated by offsetting the seed with the device
    index.  Returns (sharded new state, global episode count)."""
    from jax.sharding import PartitionSpec as P

    pair_spec = (P(None, axis), P(None, axis))
    state_spec = RolloutState(cur=pair_spec, opp=pair_spec,
                              legal=pair_spec)

    def local(state, seed):
        dev_seed = seed + jax.lax.axis_index(axis).astype(jnp.int32) * 7919
        new_state, eps = rollout_chunk(state, dev_seed, num_steps,
                                       interpret=interpret)
        return new_state, jax.lax.psum(eps, axis)

    # check_vma=False: pallas_call's out_shape structs carry no varying-
    # mesh-axes annotation, which the checker would otherwise reject.
    fn = jax.shard_map(local, mesh=mesh, in_specs=(state_spec, P()),
                       out_specs=(state_spec, P()), check_vma=False)
    return fn(state, jnp.asarray(seed, jnp.int32))


@functools.partial(jax.jit, static_argnames=("num_steps", "interpret"))
def rollout_chunk(state: RolloutState, seed: jnp.ndarray, num_steps: int,
                  interpret: bool = False):
    """Run ``num_steps`` random plies for every game in ONE kernel.
    Returns (new_state, episodes_completed: int32 scalar)."""
    shape = state.cur[0].shape
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    word = jax.ShapeDtypeStruct(shape, jnp.uint32)
    # The HLO interpreter can't lower pltpu.prng_*; use the mosaic TPU
    # interpreter for CPU testing.
    interp = pltpu.InterpretParams() if interpret else False
    outs = pl.pallas_call(
        _make_kernel(num_steps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vmem] * 6,
        out_specs=tuple([vmem] * 6
                        + [pl.BlockSpec(memory_space=pltpu.SMEM)]),
        out_shape=tuple([word] * 6
                        + [jax.ShapeDtypeStruct((1, 1), jnp.int32)]),
        interpret=interp,
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1),
      state.cur[0], state.cur[1], state.opp[0], state.opp[1],
      state.legal[0], state.legal[1])
    c0, c1, o0, o1, l0, l1, eps = outs
    return RolloutState(cur=(c0, c1), opp=(o0, o1),
                        legal=(l0, l1)), eps[0, 0]


@functools.partial(jax.jit,
                   static_argnames=("n_chunks", "num_steps", "interpret"))
def rollout_chunks_scanned(state: RolloutState, seed0, n_chunks: int,
                           num_steps: int, interpret: bool = False):
    """Chain ``n_chunks`` fused rollout chunks inside ONE jitted scan —
    one dispatch + one fetch for the whole region.  This is the canonical
    measurement harness (bench.py, scripts/bench_scan_check.py): through
    the axon tunnel a Python-level kernel dispatch costs ~3-4 ms and a
    host fetch ~20 ms, so timing per-chunk calls measures the tunnel, not
    the chip (RESULTS.md).  Chunk ``i`` uses seed ``seed0 + i``.  Returns
    (new_state, total_episodes)."""
    def body(carry, seed):
        state, total = carry
        state, eps = rollout_chunk(state, seed, num_steps,
                                   interpret=interpret)
        return (state, total + eps), None

    (state, total), _ = jax.lax.scan(
        body, (state, jnp.int32(0)),
        jnp.asarray(seed0, jnp.int32)
        + jnp.arange(n_chunks, dtype=jnp.int32))
    return state, total
