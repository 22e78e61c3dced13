"""Bitboard-native state/env (core/bitboard.BitState + envs/bit_vector_env)
vs the plane-state path."""

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import bitboard as bb
from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.envs.bit_vector_env import bitvec_reset, bitvec_step
from gymothelloenv_tpu.envs.vector_env import vec_reset, vec_step


def _assert_bits_match_planes(bits: bb.BitState, s: core.OthelloState):
    np.testing.assert_array_equal(np.asarray(bb.to_board(bits)),
                                  np.asarray(s.board))
    np.testing.assert_array_equal(np.asarray(bits.turn), np.asarray(s.turn))
    np.testing.assert_array_equal(
        np.asarray(bb.unpack2(bits.legal)).reshape(
            np.asarray(s.legal).shape),
        np.asarray(s.legal))
    np.testing.assert_array_equal(np.asarray(bits.terminated),
                                  np.asarray(s.terminated))
    np.testing.assert_array_equal(np.asarray(bits.winner),
                                  np.asarray(s.winner))


def test_bit_reset_matches_plane_reset():
    s = core.reset(EnvConfig())
    _assert_bits_match_planes(bb.bit_reset(), s)
    batched = bb.bit_reset((5,))
    assert batched.black[0].shape == (5,)
    np.testing.assert_array_equal(np.asarray(bb.to_board(batched))[0],
                                  np.asarray(s.board))


def test_bit_step_playout_matches_plane_step():
    """Random playouts: bit_step state must track core.step ply by ply
    (including pass, terminal, winner, disk rewards)."""
    for cfg in (EnvConfig(), EnvConfig(num_disk_as_reward=True)):
        jstep = jax.jit(core.step, static_argnums=2)
        jbit = jax.jit(lambda b, a: bb.bit_step(
            b, a, cfg.sudden_death_on_invalid_move,
            cfg.num_disk_as_reward))
        rng = np.random.RandomState(7)
        s = core.reset(cfg)
        bits = bb.bit_reset()
        for ply in range(70):
            legal = np.asarray(s.legal)
            idx = np.nonzero(legal)[0]
            a = jnp.int32(int(idx[rng.randint(len(idx))]))
            r = jstep(s, a, cfg)
            rb = jbit(bits, a)
            s, bits = r.state, rb.state
            _assert_bits_match_planes(bits, s)
            np.testing.assert_allclose(float(rb.reward), float(r.reward))
            assert bool(rb.done) == bool(r.done)
            if bool(s.terminated):
                break
        assert bool(s.terminated)


def test_bit_step_sudden_death_on_illegal():
    bits = bb.bit_reset()
    illegal = jnp.int32(0)   # corner is never legal at the opening
    r = bb.bit_step(bits, illegal, True, False)
    assert bool(r.done)
    assert int(r.state.winner) == 1      # mover was black -> white wins
    assert float(r.reward) == -1.0


def test_random_legal_bit_uniform_and_legal():
    rng = np.random.RandomState(11)
    cells = rng.randint(0, 3, (256, 8, 8))
    mine = jnp.asarray(cells == 1)
    opp = jnp.asarray(cells == 2)
    legal = bb.legal_mask2(bb.pack2(mine), bb.pack2(opp))
    legal_flat = np.asarray(bb.unpack2(legal)).reshape(256, 64)
    draw = jax.jit(bb.random_legal_bit)

    counts = np.zeros((256, 64))
    trials = 300
    for t in range(trials):
        a = np.asarray(draw(jax.random.PRNGKey(t), legal))
        has = legal_flat.any(axis=1)
        assert legal_flat[np.arange(256), a][has].all()
        counts[np.arange(256), a] += 1
    # Uniformity: per-board frequency of each legal cell ~ trials/n_legal.
    for i in range(0, 256, 37):
        n = legal_flat[i].sum()
        if n < 2:
            continue
        freq = counts[i][legal_flat[i]]
        expect = trials / n
        assert abs(freq - expect).max() < 6 * np.sqrt(expect), (i, freq)


def test_bitvec_env_matches_plane_vec_env_on_same_actions():
    """Drive both vector envs with one identical pre-drawn action sequence
    (no random openings so no RNG consumption skew): rewards/dones and
    boards must agree every step."""
    cfg = EnvConfig()
    n = 16
    key = jax.random.PRNGKey(0)
    vstate = vec_reset(key, cfg, n)
    bstate = bitvec_reset(key, n)
    rng = np.random.RandomState(3)
    for t in range(80):
        legal = np.asarray(bb.unpack2(bstate.core.legal)).reshape(n, 64)
        acts = np.array([int(rng.choice(np.nonzero(row)[0]))
                         for row in legal], np.int32)
        vres = vec_step(vstate, jnp.asarray(acts), cfg)
        bres = bitvec_step(bstate, jnp.asarray(acts), cfg)
        np.testing.assert_array_equal(np.asarray(vres.done),
                                      np.asarray(bres.done))
        np.testing.assert_allclose(np.asarray(vres.reward),
                                   np.asarray(bres.reward))
        vstate, bstate = vres.state, bres.state
        np.testing.assert_array_equal(
            np.asarray(bb.to_board(bstate.core)),
            np.asarray(vstate.core.board))


def test_bitvec_env_random_openings_consume_counter():
    state = bitvec_reset(jax.random.PRNGKey(1), 32, initial_rand_steps=10)
    rl0 = np.asarray(state.rand_left)
    assert ((rl0 % 2) == 0).all() and rl0.max() <= 10
    res = bitvec_step(state, jnp.zeros((32,), jnp.int32), EnvConfig(),
                      initial_rand_steps=10)
    rl1 = np.asarray(res.state.rand_left)
    dropped = rl0 > 0
    # Games in the forced-random phase ticked down; corner action 0 is
    # illegal at the opening so non-random games sudden-death and reset.
    assert (rl1[dropped] == rl0[dropped] - 1).all()
