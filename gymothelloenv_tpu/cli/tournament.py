"""Round-robin tournament CLI reproducing the reference README table
(README.md:36-50): every policy pair plays N games on 8x8, first
``init-rand-steps`` plies random, rows play black.

Usage:
    python -m gymothelloenv_tpu.cli.tournament --games 100
    python -m gymothelloenv_tpu.cli.tournament --black greedy --white rand
"""

from __future__ import annotations

import argparse
import time

import jax

from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.policies import make_policy
from gymothelloenv_tpu.policies.chunking import (live_cost_of_spec,
                                                 maybe_chunked)
from gymothelloenv_tpu.train import play_games, tally

DEFAULT_LINEUP = ("rand", "greedy", "maximin-1", "maximin-2", "maximin-3")


def policy_from_spec(spec: str, cfg: EnvConfig,
                     num_games: int = 0, expand_chunk: int = -1):
    """``num_games`` > 0 enables memory-bounded evaluation: deep searches
    are lax.map-chunked so any game count fits on device (the reference's
    per-game recursion never OOMs either, simple_policies.py:111-155).
    ``expand_chunk``: 0 = auto from the cost model, >0 = forced chunk,
    <0 = full vmap (the old behavior).  Depth-3 maximin gets the
    restructured batched path (``chunking.maximin_deep_batched``: root
    ply folded into the chunk axis — one lax.map level, any game count);
    depth >= 4 is never device-chunked (nested root maps,
    chunking.device_chunk_unsafe) — callers bound its memory by
    splitting games into host-side segments
    (``chunking.host_segment_size``) instead."""
    from gymothelloenv_tpu.policies import chunking
    if spec.startswith("maximin-"):
        depth = int(spec.split("-")[1])
        # expand_chunk < 0 keeps the old per-game full-vmap act (root
        # lax.map serializes the 64x expansion; n x 4096 live — smaller
        # than an unchunked node batch would be).
        if (depth == 3 and num_games > 0 and expand_chunk >= 0
                and chunking.DEEP3_BATCHED):
            return chunking.maximin_deep_batched(
                cfg, num_games, chunk_override=expand_chunk)
        act = make_policy("maximin", cfg, search_depth=depth)
    else:
        act = make_policy(spec, cfg)
    if num_games > 0 and not chunking.device_chunk_unsafe(spec):
        act = maybe_chunked(act, num_games, live_cost_of_spec(spec),
                            chunk_override=expand_chunk, label=spec)
    return act


def main(argv=None):
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()   # absorb the axon tunnel init before queuing big programs
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=100)
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--init-rand-steps", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--black", type=str, default=None,
                        help="single pairing: black policy spec")
    parser.add_argument("--white", type=str, default=None)
    parser.add_argument("--lineup", type=str, default=",".join(DEFAULT_LINEUP))
    parser.add_argument("--expand-chunk", type=int, default=0,
                        help="game-chunk size for deep-search policies "
                             "(0 = auto from the memory cost model, "
                             "<0 = unchunked full vmap)")
    args, _ = parser.parse_known_args(argv)

    cfg = EnvConfig(board_size=args.board_size)
    key = jax.random.PRNGKey(args.seed)

    if args.black and args.white:
        pairs = [(args.black, args.white)]
    else:
        lineup = args.lineup.split(",")
        pairs = [(b, w) for b in lineup for w in lineup]

    policies = {}

    def get(spec):
        if spec not in policies:
            policies[spec] = policy_from_spec(
                spec, cfg, num_games=args.games,
                expand_chunk=args.expand_chunk)
        return policies[spec]

    from gymothelloenv_tpu.policies.chunking import host_segment_size

    results = {}
    for black, white in pairs:
        t0 = time.time()
        # Depth>=3 searches run full-vmap in host-side segments of the
        # proven-safe size; everything else is one device program
        # (device-chunked as needed).  See policies/chunking.py.
        seg = host_segment_size((black, white), args.games)
        bw = d = ww = 0
        left = args.games
        while left > 0:
            n = min(seg, left)
            key, sub = jax.random.split(key)
            winners = play_games(sub, cfg, get(black), get(white),
                                 num_games=n,
                                 init_rand_steps=args.init_rand_steps)
            b_, d_, w_ = (int(x) for x in tally(winners))
            bw, d, ww = bw + b_, d + d_, ww + w_
            left -= n
        dt = time.time() - t0
        results[(black, white)] = (bw, d, ww)
        print(f"{black:>10} (B) vs {white:<10} (W):  "
              f"{bw:3d} / {d:2d} / {ww:3d}   [{dt:6.2f}s]", flush=True)

    if len(pairs) > 1:
        lineup = args.lineup.split(",")
        width = max(len(s) for s in lineup) + 2
        header = " " * width + "".join(f"{w:>14}" for w in lineup)
        print("\n" + header)
        for b in lineup:
            row = "".join("{:>14}".format("{}/{}/{}".format(
                *results[(b, w)])) for w in lineup)
            print(f"{b:<{width}}" + row)


if __name__ == "__main__":
    main()
