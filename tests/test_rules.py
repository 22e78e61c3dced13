"""Rules-engine parity tests: JAX engine vs. the clean-room numpy spec oracle
plus hand-written golden cases (pass, sudden death, wipeout, draw, rewards).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymothelloenv_tpu import EnvConfig, reset, step, legal_actions
from gymothelloenv_tpu.core.state import OthelloState, observe

from reference_spec import SpecGame

JSTEP = jax.jit(step, static_argnums=2)


def make_jax_state(board, turn, cfg):
    board = jnp.asarray(board, jnp.int8)
    turn = jnp.int8(turn)
    return OthelloState(
        board=board, turn=turn,
        legal=legal_actions(board, turn),
        terminated=jnp.bool_(False), winner=jnp.int8(0))


@pytest.mark.parametrize("board_size", [4, 6, 8])
def test_initial_state(board_size):
    cfg = EnvConfig(board_size=board_size)
    s = reset(cfg)
    spec = SpecGame(board_size)
    np.testing.assert_array_equal(np.asarray(s.board), spec.board)
    assert int(s.turn) == spec.turn == -1
    assert sorted(np.nonzero(np.asarray(s.legal))[0].tolist()) == spec.legal


def test_opening_black_19():
    cfg = EnvConfig()
    s = reset(cfg)
    r = jax.jit(step, static_argnums=2)(s, jnp.int32(19), cfg)
    # Black plays (2,3): flips (3,3).
    assert int(r.state.board[2, 3]) == -1
    assert int(r.state.board[3, 3]) == -1
    assert int(r.state.turn) == 1
    assert not bool(r.done)
    assert sorted(np.nonzero(np.asarray(r.state.legal))[0].tolist()) == \
        [18, 20, 34]


@pytest.mark.parametrize("board_size,sudden,disk_reward", [
    (8, True, False),
    (8, False, False),
    (8, True, True),
    (6, True, False),
    (4, True, True),
    (4, False, True),
])
def test_random_playout_parity(board_size, sudden, disk_reward):
    """Full random games: every transition of the JAX engine must match the
    spec oracle exactly (board, turn, legal set, reward, done, winner)."""
    cfg = EnvConfig(board_size=board_size,
                    sudden_death_on_invalid_move=sudden,
                    num_disk_as_reward=disk_reward)
    jstep = JSTEP
    rng = np.random.RandomState(board_size * 100 + sudden * 7 + disk_reward)

    for game in range(4):
        spec = SpecGame(board_size, sudden, disk_reward)
        s = reset(cfg)
        for ply in range(3 * board_size * board_size):
            assert not spec.terminated
            legal = spec.legal
            # Occasionally play an illegal move to exercise those paths.
            if rng.rand() < 0.05:
                action = int(rng.randint(board_size ** 2))
            else:
                action = int(legal[rng.randint(len(legal))])

            jr = jstep(s, jnp.int32(action), cfg)
            obs, reward, done = spec.step(action)

            np.testing.assert_array_equal(
                np.asarray(jr.state.board), spec.board,
                err_msg=f"game {game} ply {ply} action {action}")
            assert float(jr.reward) == reward
            assert bool(jr.done) == done
            if done:
                assert int(jr.state.winner) == spec.winner
                break
            assert int(jr.state.turn) == spec.turn
            assert sorted(
                np.nonzero(np.asarray(jr.state.legal))[0].tolist()) == \
                spec.legal
            np.testing.assert_array_equal(np.asarray(jr.obs), obs)
            s = jr.state
        else:
            pytest.fail("game did not terminate")


def test_sudden_death_loss():
    cfg = EnvConfig()
    s = reset(cfg)
    r = jax.jit(step, static_argnums=2)(s, jnp.int32(0), cfg)  # illegal
    assert bool(r.done)
    assert int(r.state.winner) == 1          # mover was black -> white wins
    assert float(r.reward) == -1.0           # mover-perspective loss


def test_invalid_move_without_sudden_death_forfeits_turn():
    cfg = EnvConfig(sudden_death_on_invalid_move=False)
    s = reset(cfg)
    r = jax.jit(step, static_argnums=2)(s, jnp.int32(0), cfg)
    assert not bool(r.done)
    np.testing.assert_array_equal(np.asarray(r.state.board),
                                  np.asarray(s.board))
    assert int(r.state.turn) == 1            # white to move now


def test_wipeout_disk_reward():
    # Construct a position where black's move captures every white disk.
    cfg = EnvConfig(num_disk_as_reward=True)
    board = np.zeros((8, 8), np.int8)
    board[3, 3] = -1
    board[3, 4] = 1
    s = make_jax_state(board, -1, cfg)
    assert 29 in np.nonzero(np.asarray(s.legal))[0]  # (3,5)
    r = jax.jit(step, static_argnums=2)(s, jnp.int32(29), cfg)
    assert bool(r.done)                      # white wiped out -> stuck board
    assert int(r.state.winner) == -1
    assert float(r.reward) == 64.0           # wipeout bonus (othello.py:454-459)


def test_pass_rule():
    # White has no answer: black's move leaves white without a legal move,
    # so the turn bounces back to black (othello.py:436-441).
    board = np.zeros((8, 8), np.int8)
    board[0, 0] = -1
    board[0, 1] = 1
    board[0, 3] = -1
    board[5, 5] = -1   # far-away disks keep the game alive
    board[7, 7] = -1
    cfg = EnvConfig()
    spec = SpecGame(8)
    spec.board = board.astype(np.int64).copy()
    spec.turn = -1
    spec.legal = spec._legal_moves(-1)
    s = make_jax_state(board, -1, cfg)
    assert spec.legal == sorted(np.nonzero(np.asarray(s.legal))[0].tolist())
    action = spec.legal[0]
    jr = jax.jit(step, static_argnums=2)(s, jnp.int32(action), cfg)
    spec.step(action)
    assert int(jr.state.turn) == spec.turn
    np.testing.assert_array_equal(np.asarray(jr.state.board), spec.board)


def test_vmapped_batch_consistency():
    """A batch of games stepped under vmap matches stepping them one-by-one."""
    cfg = EnvConfig()
    n = 16
    rng = np.random.RandomState(0)
    states = jax.vmap(lambda _: reset(cfg))(jnp.arange(n))
    vstep = jax.jit(jax.vmap(step, in_axes=(0, 0, None)), static_argnums=2)
    sstep = jax.jit(step, static_argnums=2)

    for _ in range(10):
        legal = np.asarray(states.legal)
        actions = []
        for i in range(n):
            idx = np.nonzero(legal[i])[0]
            actions.append(int(idx[rng.randint(len(idx))]) if len(idx)
                           else 0)
        actions = jnp.asarray(actions, jnp.int32)
        batch = vstep(states, actions, cfg)
        for i in range(n):
            single = sstep(jax.tree.map(lambda x: x[i], states),
                           actions[i], cfg)
            np.testing.assert_array_equal(
                np.asarray(single.state.board),
                np.asarray(batch.state.board[i]))
            assert bool(single.done) == bool(batch.done[i])
        # Re-reset finished games so the loop can continue.
        fresh = jax.vmap(lambda _: reset(cfg))(jnp.arange(n))
        states = jax.tree.map(
            lambda f, s: jnp.where(
                batch.done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s),
            fresh, batch.state)


def test_observation_is_canonical():
    cfg = EnvConfig()
    s = reset(cfg)
    obs = observe(s)
    # Black to move: black disks must appear as +1.
    assert int(obs[3, 4]) == 1 and int(obs[4, 3]) == 1
    assert int(obs[3, 3]) == -1 and int(obs[4, 4]) == -1
