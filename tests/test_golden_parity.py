"""Bit-exact parity against transcripts recorded from the REAL reference
implementation (tests/golden/generate_golden.py ran /root/reference under a
gym shim; the JSON is committed so this test needs no reference mount).

For every deterministic golden game: replay the recorded actions through the
JAX engine checking legal sets/rewards/turns/final board/winner ply by ply,
then evaluate the JAX scripted policies on ALL recorded positions in one
vmapped batch and compare the chosen actions.
"""

import functools
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymothelloenv_tpu import EnvConfig, reset, step
from gymothelloenv_tpu.policies import greedy_action, maximin_action

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_games.json")
CFG = EnvConfig()

with open(GOLDEN) as f:
    DATA = json.load(f)

GAME_IDS = [f"{g['black']}_vs_{g['white']}" for g in DATA["games"]]

JSTEP = jax.jit(step, static_argnums=2)


def replay_engine(game):
    """Replay recorded actions; returns the list of pre-move states."""
    jstep = JSTEP
    s = reset(CFG)
    states = []
    for i, rec in enumerate(game["steps"]):
        assert not bool(s.terminated)
        assert int(s.turn) == rec["turn"], f"ply {i}"
        got_legal = sorted(np.nonzero(np.asarray(s.legal))[0].tolist())
        assert got_legal == sorted(rec["legal"]), f"ply {i}"
        states.append(s)
        r = jstep(s, jnp.int32(rec["action"]), CFG)
        assert float(r.reward) == rec["reward"], f"ply {i}"
        assert bool(r.done) == rec["done"], f"ply {i}"
        s = r.state
    np.testing.assert_array_equal(np.asarray(s.board),
                                  np.asarray(game["final_board"]))
    assert int(s.winner) == game["winner"]
    return states


def stack_states(states):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


@functools.cache
def batched_policy(spec):
    if spec == "greedy":
        fn = greedy_action
    else:
        depth = int(spec.split("-")[1])
        fn = functools.partial(maximin_action, cfg=CFG,
                               max_search_depth=depth)
    return jax.jit(jax.vmap(fn))


@pytest.mark.parametrize("game", DATA["games"], ids=GAME_IDS)
def test_golden_engine_replay(game):
    replay_engine(game)


# Positions verified per (game, policy): depth-3 maximin is ~5s/position
# on the CPU test backend, so its cap is small.  Batches are PADDED (by
# cycling indices) to exactly the cap so each policy spec compiles once
# across all games instead of once per batch shape.
_POSITION_CAP = {"greedy": 16, "maximin-2": 16, "maximin-3": 4}


@pytest.mark.parametrize(
    "game",
    [pytest.param(g, marks=[pytest.mark.slow]
                  if "maximin-3" in (g["black"], g["white"]) else [])
     for g in DATA["games"]], ids=GAME_IDS)
def test_golden_policy_actions(game):
    states = replay_engine(game)
    turns = np.asarray([rec["turn"] for rec in game["steps"]])
    actions = np.asarray([rec["action"] for rec in game["steps"]])
    batch = stack_states(states)
    for color, spec in ((-1, game["black"]), (1, game["white"])):
        idx = np.nonzero(turns == color)[0]
        cap = _POSITION_CAP[spec]
        idx = idx[np.arange(cap) % len(idx)]     # fixed-size, cycled
        sub = jax.tree.map(lambda x: x[idx], batch)
        got = np.asarray(batched_policy(spec)(sub))
        np.testing.assert_array_equal(got, actions[idx],
                                      err_msg=f"{spec} as {color}")
