"""Scripted-policy parity: JAX greedy/maximin vs. the spec oracles, plus the
README-documented equivalence maximin-1 == greedy and tournament statistics.
"""

import functools

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu import EnvConfig, legal_actions
from gymothelloenv_tpu.core.state import OthelloState
from gymothelloenv_tpu.policies import (greedy_action, maximin_action,
                                        random_policy, greedy_policy,
                                        maximin_policy)
from gymothelloenv_tpu.train import play_games, tally

from reference_spec import (SpecGame, spec_greedy_action,
                            spec_maximin_action)

CFG = EnvConfig()


def sample_positions(n_games=6, seed=3, board_size=8):
    """Positions reached in random playouts (each: SpecGame snapshot)."""
    rng = np.random.RandomState(seed)
    positions = []
    for _ in range(n_games):
        g = SpecGame(board_size)
        while not g.terminated:
            positions.append((g.board.copy(), g.turn))
            a = g.legal[rng.randint(len(g.legal))]
            g.step(a)
    return positions


def to_state(board, turn):
    board = jnp.asarray(board, jnp.int8)
    turn = jnp.int8(turn)
    return OthelloState(board=board, turn=turn,
                        legal=legal_actions(board, turn),
                        terminated=jnp.bool_(False), winner=jnp.int8(0))


def spec_game_from(board, turn, board_size=8):
    g = SpecGame(board_size)
    g.board = np.asarray(board, np.int64).copy()
    g.turn = int(turn)
    g.legal = g._legal_moves(g.turn)
    return g


def test_greedy_matches_oracle():
    jgreedy = jax.jit(greedy_action)
    for board, turn in sample_positions():
        got = int(jgreedy(to_state(board, turn)))
        want = spec_greedy_action(spec_game_from(board, turn))
        assert got == want, f"turn={turn}\n{board}"


def test_maximin_matches_oracle_depths_1_2():
    for depth in (1, 2):
        jmm = jax.jit(functools.partial(maximin_action, cfg=CFG,
                                        max_search_depth=depth))
        for board, turn in sample_positions(n_games=1, seed=11):
            got = int(jmm(to_state(board, turn)))
            want = spec_maximin_action(spec_game_from(board, turn), depth)
            assert got == want, f"depth={depth} turn={turn}\n{board}"


@pytest.mark.slow
def test_maximin_depth3_matches_oracle_spot():
    jmm = jax.jit(functools.partial(maximin_action, cfg=CFG,
                                    max_search_depth=3))
    positions = sample_positions(n_games=1, seed=5)[:6]
    for board, turn in positions:
        got = int(jmm(to_state(board, turn)))
        want = spec_maximin_action(spec_game_from(board, turn), 3)
        assert got == want


def test_maximin1_equals_greedy():
    """README.md:54: Maximin-1 is equivalent to Greedy."""
    jmm = jax.jit(functools.partial(maximin_action, cfg=CFG,
                                    max_search_depth=1))
    jgreedy = jax.jit(greedy_action)
    for board, turn in sample_positions(n_games=3, seed=21):
        s = to_state(board, turn)
        assert int(jmm(s)) == int(jgreedy(s))


def test_tournament_runs_and_greedy_beats_random():
    key = jax.random.PRNGKey(0)
    winners = play_games(key, CFG, greedy_policy, random_policy,
                         num_games=200, init_rand_steps=10)
    bw, d, ww = (int(x) for x in tally(winners))
    assert bw + d + ww == 200
    # Reference table: greedy (black) vs random (white) is 61/5/34 over 100
    # games (README.md:47).  Allow generous binomial slack.
    assert bw > 100, (bw, d, ww)


def test_tournament_random_vs_random_roughly_even():
    key = jax.random.PRNGKey(1)
    winners = play_games(key, CFG, random_policy, random_policy,
                         num_games=400, init_rand_steps=10)
    bw, d, ww = (int(x) for x in tally(winners))
    assert bw + d + ww == 400
    # README.md:46: 48/6/46 — both sides near 50%.
    assert abs(bw - ww) < 120, (bw, d, ww)


@pytest.mark.slow
def test_tournament_maximin2_beats_random():
    key = jax.random.PRNGKey(2)
    winners = play_games(key, CFG, maximin_policy(2, CFG), random_policy,
                         num_games=16, init_rand_steps=10)
    bw, d, ww = (int(x) for x in tally(winners))
    # README.md:49: 72/1/27 over 100 games; loose bound for a small sample.
    assert bw > 7, (bw, d, ww)
