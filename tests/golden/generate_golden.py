"""Generate golden game transcripts by RUNNING the reference implementation
(read-only at /root/reference) under a minimal gym/pyglet shim.

The output JSON (committed as tests/golden/golden_games.json) records, for a
set of fully deterministic policy matchups (initial_rand_steps=0), the full
action sequence, per-step rewards/turns, final board and winner.  Tests then
replay these against the JAX engine + policies — true bit-exact parity with
the reference, with no runtime dependency on the reference mount.

Usage (needs /root/reference mounted):
    python tests/golden/generate_golden.py
"""

import json
import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REFERENCE = "/root/reference"


def install_shims():
    """Minimal stand-ins for the reference's gym/pyglet imports."""
    gym = types.ModuleType("gym")

    class Env:
        metadata = {}

    class Discrete:
        def __init__(self, n):
            self.n = n

    class Box:
        def __init__(self, low, high):
            self.low, self.high = np.asarray(low), np.asarray(high)
            self.shape = self.low.shape

    spaces = types.ModuleType("gym.spaces")
    spaces.Discrete = Discrete
    spaces.Box = Box
    gym.Env = Env
    gym.spaces = spaces
    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = spaces

    pyglet = types.ModuleType("pyglet")
    pyglet.gl = types.ModuleType("pyglet.gl")
    sys.modules["pyglet"] = pyglet
    sys.modules["pyglet.gl"] = pyglet.gl


def main():
    install_shims()
    sys.path.insert(0, REFERENCE)
    import othello           # noqa: E402  (reference module)
    import simple_policies   # noqa: E402

    def make_policy(spec):
        if spec == "greedy":
            return simple_policies.GreedyPolicy()
        if spec.startswith("maximin-"):
            return simple_policies.MaxiMinPolicy(int(spec.split("-")[1]))
        raise ValueError(spec)

    def planes_for(env, obs):
        """4-plane featurization equivalent to util.make_state(obs, env)
        (util.py:48-74) — GreedyPolicy expects this input; the reference
        drivers always feed it planes (e.g. ppo_run_self_play.py:387-389)."""
        turn = int(env.player_turn)
        black = (obs == (1 if turn == -1 else -1)).astype(float)
        white = (obs == (1 if turn == 1 else -1)).astype(float)
        turn_plane = np.full(obs.shape, (turn + 1) // 2, dtype=float)
        legal = np.zeros(obs.shape, dtype=float)
        moves = list(env.possible_moves)
        if len(moves) >= 2:
            for a in moves:
                legal[a // 8, a % 8] = 1.0
        return np.stack([black, white, turn_plane, legal])

    matchups = [
        ("greedy", "greedy"),
        ("greedy", "maximin-2"),
        ("maximin-2", "greedy"),
        ("maximin-2", "maximin-2"),
        ("maximin-2", "maximin-3"),
        ("maximin-3", "maximin-2"),
        ("greedy", "maximin-3"),
        ("maximin-3", "maximin-3"),
    ]

    games = []
    for black_spec, white_spec in matchups:
        env = othello.SimpleOthelloEnv(board_size=8, initial_rand_steps=0,
                                       num_disk_as_reward=False)
        black = make_policy(black_spec)
        white = make_policy(white_spec)
        obs = env.reset()
        black.reset(env)
        white.reset(env)
        record = {"black": black_spec, "white": white_spec, "steps": []}
        done = False
        reward = 0
        while not done:
            turn = int(env.player_turn)
            policy = black if turn == -1 else white
            policy_obs = (planes_for(env, obs)
                          if isinstance(policy, simple_policies.GreedyPolicy)
                          else obs)
            action = int(policy.get_action(policy_obs))
            legal = [int(a) for a in env.possible_moves]
            obs, reward, done, _ = env.step(action)
            record["steps"].append({
                "turn": turn,
                "legal": legal,
                "action": action,
                "reward": float(reward),
                "done": bool(done),
            })
        record["final_board"] = np.asarray(env.env.board_state).tolist()
        record["winner"] = int(env.env.winner)
        games.append(record)
        print(f"{black_spec} vs {white_spec}: winner={record['winner']} "
              f"plies={len(record['steps'])}")

    out = os.path.join(HERE, "golden_games.json")
    with open(out, "w") as f:
        json.dump({"board_size": 8, "games": games}, f)
    print("wrote", out)


if __name__ == "__main__":
    main()
