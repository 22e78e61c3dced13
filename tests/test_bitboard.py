"""Bitboard kernel (8x8 fast path) vs the plane kernel."""

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import bitboard as bb
from gymothelloenv_tpu.core import bitops
from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.state import EnvConfig


def random_planes(rng, n):
    """Random disjoint (mine, opp) boolean planes."""
    cells = rng.randint(0, 3, (n, 8, 8))
    return cells == 1, cells == 2


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    plane = rng.rand(16, 8, 8) < 0.4
    got = np.asarray(bb.unpack(bb.pack(jnp.asarray(plane))))
    np.testing.assert_array_equal(got, plane)


def test_shift_matches_plane_shift():
    rng = np.random.RandomState(1)
    plane = jnp.asarray(rng.rand(8, 8, 8) < 0.4)
    for dr, dc in bb.DIRECTIONS:
        want = np.asarray(bitops.shift(plane, dr, dc))
        got = np.asarray(bb.unpack(bb.shift(bb.pack(plane), dr, dc)))
        np.testing.assert_array_equal(got, want, err_msg=f"dir {dr},{dc}")


def test_legal_and_flips_match_plane_kernel():
    rng = np.random.RandomState(2)
    mine, opp = random_planes(rng, 64)
    mine, opp = jnp.asarray(mine), jnp.asarray(opp)

    legal_plane = np.asarray(bitops.legal_mask(mine, opp))
    legal_bb = np.asarray(bb.unpack(bb.legal_mask(bb.pack(mine),
                                                  bb.pack(opp))))
    np.testing.assert_array_equal(legal_bb, legal_plane)

    # Flips for a random legal action per board (where any exist).
    flat = legal_plane.reshape(64, 64)
    for i in range(64):
        idx = np.nonzero(flat[i])[0]
        if len(idx) == 0:
            continue
        a = int(idx[rng.randint(len(idx))])
        onehot = jnp.zeros((8, 8), bool).at[a // 8, a % 8].set(True)
        want = np.asarray(bitops.resolve_flips(onehot, mine[i], opp[i]))
        got = np.asarray(bb.unpack(bb.resolve_flips(
            bb.action_bit(jnp.int32(a)), bb.pack(mine[i]),
            bb.pack(opp[i]))))
        np.testing.assert_array_equal(got, want, err_msg=f"board {i} a {a}")


def test_popcount_and_action_bit():
    rng = np.random.RandomState(3)
    plane = jnp.asarray(rng.rand(32, 8, 8) < 0.5)
    np.testing.assert_array_equal(
        np.asarray(bb.popcount(bb.pack(plane))),
        np.asarray(plane).reshape(32, -1).sum(-1))
    for a in [0, 7, 31, 32, 63]:
        got = np.asarray(bb.unpack(bb.action_bit(jnp.int32(a))))
        want = np.zeros((8, 8), bool)
        want[a // 8, a % 8] = True
        np.testing.assert_array_equal(got, want)


def test_bitboard_step_equals_plane_step():
    """Full-step equivalence on random playouts: the 8x8 dispatch
    (bitboard) vs the generic plane path forced via a 10x10-config
    trick is not possible — instead call the internal plane code path
    directly."""
    cfg = EnvConfig()
    jstep_bb = jax.jit(core.step, static_argnums=2)

    # Plane path: replicate step() body by calling through a non-8 board
    # size is invalid; instead compare against the spec-oracle replay which
    # test_rules already covers.  Here: run 4 random games through the
    # bitboard step and check every transition invariant vs plane legal
    # computations.
    rng = np.random.RandomState(4)
    jlegal = jax.jit(core.legal_actions)
    for g in range(2):
        s = core.reset(cfg)
        for ply in range(70):
            legal_plane = np.asarray(jlegal(s.board, s.turn))
            np.testing.assert_array_equal(np.asarray(s.legal), legal_plane)
            idx = np.nonzero(legal_plane)[0]
            a = int(idx[rng.randint(len(idx))])
            r = jstep_bb(s, jnp.int32(a), cfg)
            s = r.state
            if bool(s.terminated):
                break
        assert bool(s.terminated)
