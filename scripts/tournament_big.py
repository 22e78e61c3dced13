"""Large-n tournament with bounded memory: each pair's n games run as
``reps`` chunks of ``chunk`` games (fresh subkeys), tallies summed.

Motivation: a single 1000-game vmapped batch of maximin-3 expansion
crashed the TPU worker (data/logs/queue/70_tournament1000.log); the
round-1 n=100 batches are safe, so chunking trades a few extra dispatches
for a flat memory profile.  Output lines match cli/tournament.py so
scripts/tournament_ci.py consumes them directly.

Usage: python scripts/tournament_big.py [--games 1000] [--chunk 250]
       [--maximin3-chunk 125] [--seed 0]
"""

from __future__ import annotations

import argparse
import time

import jax

from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train import play_games, tally
from gymothelloenv_tpu.utils.tpu import warmup

LINEUP = ("rand", "greedy", "maximin-1", "maximin-2", "maximin-3")


def main(argv=None):
    warmup()
    from gymothelloenv_tpu.cli.tournament import policy_from_spec

    p = argparse.ArgumentParser()
    p.add_argument("--games", type=int, default=1000)
    p.add_argument("--chunk", type=int, default=250)
    p.add_argument("--maximin3-chunk", type=int, default=125)
    p.add_argument("--init-rand-steps", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    args, _ = p.parse_known_args(argv)

    cfg = EnvConfig()
    key = jax.random.PRNGKey(args.seed)
    policies = {s: policy_from_spec(s, cfg) for s in LINEUP}

    results = {}
    for black in LINEUP:
        for white in LINEUP:
            chunk = (args.maximin3_chunk
                     if "maximin-3" in (black, white) else args.chunk)
            reps = -(-args.games // chunk)
            bw = d = ww = 0
            t0 = time.time()
            for _ in range(reps):
                key, sub = jax.random.split(key)
                winners = play_games(sub, cfg, policies[black],
                                     policies[white], num_games=chunk,
                                     init_rand_steps=args.init_rand_steps)
                cb, cd, cw = (int(x) for x in tally(winners))
                bw, d, ww = bw + cb, d + cd, ww + cw
            dt = time.time() - t0
            results[(black, white)] = (bw, d, ww)
            print(f"{black:>10} (B) vs {white:<10} (W):  "
                  f"{bw:4d} / {d:3d} / {ww:4d}   [{dt:6.2f}s]", flush=True)

    width = max(len(s) for s in LINEUP) + 2
    print("\n" + " " * width + "".join(f"{w:>16}" for w in LINEUP))
    for b in LINEUP:
        row = "".join("{:>16}".format("{}/{}/{}".format(
            *results[(b, w)])) for w in LINEUP)
        print(f"{b:<{width}}" + row)


if __name__ == "__main__":
    main()
