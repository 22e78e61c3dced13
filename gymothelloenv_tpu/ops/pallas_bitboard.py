"""Pallas TPU kernel for the batched bitboard legal-move flood.

The hot op of the whole framework is the 8-direction dumb7fill over packed
uint32 bitboards (core/bitboard.py).  The XLA version is already a fused
chain of integer VPU ops; this Pallas kernel expresses the same flood with
an explicit layout chosen for the VPU — boards transposed to ``(2, N)`` so
the batch fills the 128-wide lanes and the two 32-bit words sit on
sublanes, with each grid step streaming a lane-aligned block through VMEM.

Exposed as an optional alternative (``legal_mask_pallas``); parity with the
XLA kernel is tested in tests/test_pallas.py (interpret mode on CPU, native
on TPU).  Benchmarks: scripts/bench_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# numpy scalars: concrete (not traced, so not captured as kernel
# constants) and wide enough for uint32 masks.
_NOT_COL0 = np.uint32(0xFEFEFEFE)
_NOT_COL7 = np.uint32(0x7F7F7F7F)

DIRECTIONS = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)

BLOCK = 1024   # boards per grid step (lanes: 128-aligned)


def _shift_words(w0, w1, dr, dc):
    """Bitboard translate on word rows (each (1, BLK) uint32)."""
    if dc == 1:
        w0, w1 = (w0 << 1) & _NOT_COL0, \
            (w1 << 1) & _NOT_COL0
    elif dc == -1:
        w0, w1 = (w0 >> 1) & _NOT_COL7, \
            (w1 >> 1) & _NOT_COL7
    if dr == 1:
        w0, w1 = w0 << 8, (w1 << 8) | (w0 >> 24)
    elif dr == -1:
        w0, w1 = (w0 >> 8) | (w1 << 24), w1 >> 8
    return w0, w1


def _legal_kernel(mine_ref, opp_ref, out_ref):
    m0, m1 = mine_ref[0:1, :], mine_ref[1:2, :]
    o0, o1 = opp_ref[0:1, :], opp_ref[1:2, :]
    e0 = ~(m0 | o0)
    e1 = ~(m1 | o1)
    l0 = jnp.zeros_like(m0)
    l1 = jnp.zeros_like(m1)
    for dr, dc in DIRECTIONS:
        t0, t1 = _shift_words(m0, m1, -dr, -dc)
        t0, t1 = t0 & o0, t1 & o1
        for _ in range(5):
            s0, s1 = _shift_words(t0, t1, -dr, -dc)
            t0 = t0 | (s0 & o0)
            t1 = t1 | (s1 & o1)
        s0, s1 = _shift_words(t0, t1, -dr, -dc)
        l0 = l0 | (e0 & s0)
        l1 = l1 | (e1 & s1)
    out_ref[0:1, :] = l0
    out_ref[1:2, :] = l1


@functools.partial(jax.jit, static_argnames=("interpret",))
def legal_mask_pallas(mine: jnp.ndarray, opp: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Legal placements for ``mine``; inputs/outputs are (N, 2) uint32
    bitboards (same convention as core/bitboard).  N is padded to BLOCK."""
    n = mine.shape[0]
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    pad = [(0, n_pad - n), (0, 0)]
    mine_t = jnp.pad(mine, pad).T           # (2, n_pad)
    opp_t = jnp.pad(opp, pad).T

    out = pl.pallas_call(
        _legal_kernel,
        grid=(n_pad // BLOCK,),
        in_specs=[
            pl.BlockSpec((2, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.ANY if interpret
                         else pltpu.VMEM),
            pl.BlockSpec((2, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.ANY if interpret
                         else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n_pad), jnp.uint32),
        interpret=interpret,
    )(mine_t, opp_t)
    return out.T[:n]
