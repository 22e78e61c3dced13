"""Perft cross-validation: the JAX bitboard engine against an independent
native C++ engine (native/othello_perft.cpp) — the two rule
implementations must agree on the number of distinct move sequences from
the opening AND from random midgame positions, which exercises legal-move
generation and flip resolution over hundreds of thousands of distinct
positions (far denser than the recorded golden games).

The canonical opening perft values (4, 12, 56, 244, 1396, 8200, 55092)
are additionally pinned so a bug common to BOTH engines would still be
caught at the shallow depths.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

import jax

from gymothelloenv_tpu.core import bitboard as bb
from gymothelloenv_tpu.core.perft import perft, perft_from

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
SO_PATH = os.path.join(NATIVE_DIR, "libothello_perft.so")

# Published opening perft values (placement sequences; forced passes
# consume no depth) — see e.g. the reversi-programming perft lore.
KNOWN = {1: 4, 2: 12, 3: 56, 4: 244, 5: 1396, 6: 8200, 7: 55092}


@pytest.fixture(scope="module")
def native():
    if not os.path.exists(SO_PATH) or (
            os.path.getmtime(SO_PATH)
            < os.path.getmtime(os.path.join(NATIVE_DIR,
                                            "othello_perft.cpp"))):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", SO_PATH,
             os.path.join(NATIVE_DIR, "othello_perft.cpp")],
            check=True)
    lib = ctypes.CDLL(SO_PATH)
    lib.othello_perft.restype = ctypes.c_ulonglong
    lib.othello_perft.argtypes = [ctypes.c_int]
    lib.othello_perft_from.restype = ctypes.c_ulonglong
    lib.othello_perft_from.argtypes = [ctypes.c_uint64, ctypes.c_uint64,
                                       ctypes.c_int]
    lib.othello_legal.restype = ctypes.c_uint64
    lib.othello_legal.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    return lib


def _u64(pair) -> int:
    return int(pair[0]) | (int(pair[1]) << 32)


def _random_positions(n, plies, seed):
    """Distinct midgame positions from random legal play (bit engine)."""
    import jax.numpy as jnp

    @jax.jit
    def play(state, key):
        def ply(state, k):
            actions = jax.vmap(bb.random_legal_bit)(
                jax.random.split(k, n), state.legal)
            res = bb.bit_step(state, actions)
            state = jax.tree.map(
                lambda nw, od: jnp.where(
                    state.terminated.reshape(
                        (-1,) + (1,) * (nw.ndim - 1)), od, nw),
                res.state, state)
            return state, None

        state, _ = jax.lax.scan(ply, state,
                                jax.random.split(key, plies))
        return state

    state = play(bb.bit_reset((n,)), jax.random.PRNGKey(seed))
    return jax.tree.map(np.asarray, state)


def test_opening_perft_matches_native_and_published(native):
    for d, want in KNOWN.items():
        got_jax = perft(d)
        got_cpp = int(native.othello_perft(d))
        assert got_jax == got_cpp == want, (d, got_jax, got_cpp, want)


def test_midgame_perft_matches_native(native):
    state = _random_positions(n=12, plies=20, seed=11)
    checked = 0
    for i in range(12):
        if bool(state.terminated[i]):
            continue
        cur_is_black = int(state.turn[i]) == -1
        mine = (np.uint32(state.black[0][i]), np.uint32(state.black[1][i]))
        theirs = (np.uint32(state.white[0][i]),
                  np.uint32(state.white[1][i]))
        if not cur_is_black:
            mine, theirs = theirs, mine
        for d in (2, 3, 4):
            got_jax = perft_from(mine, theirs, d)
            got_cpp = int(native.othello_perft_from(
                _u64(mine), _u64(theirs), d))
            assert got_jax == got_cpp, (i, d, got_jax, got_cpp)
        checked += 1
    assert checked >= 8


def test_legal_mask_matches_native_bitwise(native):
    state = _random_positions(n=32, plies=14, seed=3)
    for i in range(32):
        mine = (np.uint32(state.black[0][i]), np.uint32(state.black[1][i]))
        theirs = (np.uint32(state.white[0][i]),
                  np.uint32(state.white[1][i]))
        if int(state.turn[i]) == 1:
            mine, theirs = theirs, mine
        got = _u64(jax.tree.map(
            np.uint32, bb.legal_mask2(
                tuple(map(np.uint32, mine)), tuple(map(np.uint32, theirs)))))
        want = int(native.othello_legal(_u64(mine), _u64(theirs)))
        assert got == want, (i, hex(got), hex(want))
