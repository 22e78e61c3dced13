"""Play a tournament pairing by RUNNING the reference implementation
(/root/reference) under the gym/pyglet shim — used to validate our on-device
tournament numbers against the reference CODE (the README table ships from
the upstream repo and may predate the fork's code).

Protocol = README.md:36-44: 8x8, N games, first `2 * U{0..5}` plies random
(initial_rand_steps=10, drawn and applied inside SimpleOthelloEnv,
othello.py:62-73), fixed colors.  Supports rand / maximin-k pairings (those
policies read the env directly; greedy needs plane featurization — use the
golden transcripts for greedy parity).

Usage:
    python scripts/reference_tournament.py maximin-3 maximin-2 --games 40
"""

import argparse
import contextlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests", "golden"))
from generate_golden import install_shims  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("black")
    parser.add_argument("white")
    parser.add_argument("--games", type=int, default=40)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--init-rand-steps", type=int, default=10)
    args = parser.parse_args()

    install_shims()
    sys.path.insert(0, "/root/reference")
    import othello           # noqa: E402
    import simple_policies   # noqa: E402

    def make_policy(spec):
        if spec == "rand":
            return simple_policies.RandomPolicy()
        if spec.startswith("maximin-"):
            return simple_policies.MaxiMinPolicy(int(spec.split("-")[1]))
        raise ValueError(f"unsupported here: {spec!r}")

    pol = {-1: make_policy(args.black), 1: make_policy(args.white)}
    wins = draws = losses = 0
    devnull = open(os.devnull, "w")
    for g in range(args.games):
        with contextlib.redirect_stdout(devnull):
            env = othello.SimpleOthelloEnv(
                board_size=8, initial_rand_steps=args.init_rand_steps,
                seed=args.seed * 100003 + g)
            obs = env.reset()
            for p in pol.values():
                p.reset(env)
            done = False
            while not done:
                a = pol[int(env.player_turn)].get_action(obs)
                obs, reward, done, _ = env.step(a)
            white, black = env.env.count_disks()
        if black > white:
            wins += 1
        elif black == white:
            draws += 1
        else:
            losses += 1
        print(f"game {g + 1}: {wins}/{draws}/{losses}", file=sys.stderr,
              flush=True)
    print(f"REFERENCE {args.black} (B) vs {args.white} (W): "
          f"{wins} / {draws} / {losses} over {args.games} games")


if __name__ == "__main__":
    main()
