"""Pallas bitboard kernel parity (interpret mode on the CPU backend)."""

import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import bitboard as bb
from gymothelloenv_tpu.ops.pallas_bitboard import BLOCK, legal_mask_pallas


def test_pallas_legal_mask_matches_xla():
    rng = np.random.RandomState(0)
    cells = rng.randint(0, 3, (300, 8, 8))      # non-multiple of BLOCK
    mine = bb.pack(jnp.asarray(cells == 1))
    opp = bb.pack(jnp.asarray(cells == 2))
    want = np.asarray(bb.legal_mask(mine, opp))
    got = np.asarray(legal_mask_pallas(mine, opp, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_handles_exact_block_multiple():
    rng = np.random.RandomState(1)
    cells = rng.randint(0, 3, (BLOCK, 8, 8))
    mine = bb.pack(jnp.asarray(cells == 1))
    opp = bb.pack(jnp.asarray(cells == 2))
    want = np.asarray(bb.legal_mask(mine, opp))
    got = np.asarray(legal_mask_pallas(mine, opp, interpret=True))
    np.testing.assert_array_equal(got, want)
