"""Compat layer: the reference-API classes must behave exactly like the
reference (RandomState draw order, embedded-opponent semantics, prints
aside)."""

import numpy as np

from gymothelloenv_tpu.compat import (GreedyPolicy, MaxiMinPolicy,
                                      OthelloEnv, RandomPolicy,
                                      SimpleOthelloEnv)

from reference_spec import SpecGame


def test_simple_env_random_playout_matches_spec():
    env = SimpleOthelloEnv(board_size=8, seed=3, initial_rand_steps=0,
                           mute=True)
    spec = SpecGame(8)
    rng = np.random.RandomState(0)
    obs = env.reset()
    np.testing.assert_array_equal(obs, spec.observation())
    done = False
    while not done:
        moves = env.possible_moves
        assert moves == spec.legal
        a = moves[rng.randint(len(moves))]
        obs, reward, done, _ = env.step(a)
        sobs, sreward, sdone = spec.step(a)
        np.testing.assert_array_equal(obs, sobs)
        assert reward == sreward and done == sdone


def test_simple_env_rand_opening_draw_order():
    """max_rand_steps and opening-move draws come from RandomState(seed) in
    the reference's exact order (othello.py:60-73)."""
    seed, init = 7, 10
    env = SimpleOthelloEnv(board_size=8, seed=seed,
                           initial_rand_steps=init, mute=True)
    rnd = np.random.RandomState(seed)
    spec = SpecGame(8)
    env.reset()
    want_max = rnd.randint(0, init // 2 + 1) * 2
    assert env.max_rand_steps == want_max
    for ply in range(want_max):
        # Caller action should be overridden by the seeded draw.
        want_ix = rnd.randint(0, len(spec.legal))
        want_action = spec.legal[want_ix]
        env.step(-1)   # deliberately bogus; must be replaced
        spec.step(want_action)
        np.testing.assert_array_equal(env.env.board_state, spec.board)


def test_othello_env_embedded_opponent_reward_negation():
    """Protagonist-perspective rewards through the opponent-in-step loop
    (othello.py:176-200)."""
    env = OthelloEnv(white_policy=RandomPolicy(seed=1),
                     black_policy=None, protagonist=-1, board_size=8,
                     seed=0, initial_rand_steps=0, mute=True)
    rng = np.random.RandomState(5)
    total = 0
    for episode in range(3):
        obs = env.reset()
        done = False
        while not done:
            assert env.player_turn == -1
            moves = env.possible_moves
            a = moves[rng.randint(len(moves))]
            obs, reward, done, _ = env.step(a)
        # Terminal reward is from the protagonist's (black) perspective.
        w = env.env.winner
        want = 1.0 if w == -1 else (-1.0 if w == 1 else 0.0)
        assert reward == want
        total += 1
    assert total == 3


def test_compat_policies_match_jax_policies():
    env = SimpleOthelloEnv(board_size=8, seed=0, initial_rand_steps=0,
                           mute=True)
    obs = env.reset()
    greedy = GreedyPolicy()
    mm2 = MaxiMinPolicy(2)
    greedy.reset(env)
    mm2.reset(env)
    rng = np.random.RandomState(1)
    for ply in range(20):
        a_g = greedy.get_action(obs)
        a_m = mm2.get_action(obs)
        assert a_g in env.possible_moves
        assert a_m in env.possible_moves
        moves = env.possible_moves
        obs, _, done, _ = env.step(moves[rng.randint(len(moves))])
        if done:
            break


def test_switch_color_keeps_opponent_object():
    opp = RandomPolicy(seed=2)
    env = OthelloEnv(white_policy=opp, black_policy=None, protagonist=-1,
                     mute=True)
    assert env.opponent is opp
    env.switch_color()
    assert env.protagonist == 1
    assert env.opponent is opp      # reference quirk: object unchanged
