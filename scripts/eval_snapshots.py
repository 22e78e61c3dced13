"""Evaluate a SERIES of policy snapshots against one opponent in a single
process — amortizes both the axon tunnel warmup and the (expensive,
maximin) eval-program compile across every snapshot: the tournament is
jitted ONCE with the params as an argument, so same-shaped checkpoints
reuse the compiled program.

The post-hoc early-stopping companion to the trainer's ``--checkpoint
path_{step}.msgpack`` snapshot history (RESULTS.md: the ~4000-update
strength peak).

Usage:
    python scripts/eval_snapshots.py --glob 'data/selfplay/run_{step}.msgpack' \
        --steps 2000,2500,3000,3500,4000 --opponent maximin-2 --games 400
"""

from __future__ import annotations

import argparse
import time

import jax

from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.ppo_trainer import (load_eval_policy,
                                                 net_tournament_policy)
from gymothelloenv_tpu.train.tournament import play_games_impl


def main(argv=None):
    from gymothelloenv_tpu.cli.tournament import policy_from_spec
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()
    p = argparse.ArgumentParser()
    p.add_argument("--glob", required=True,
                   help="checkpoint path template with a {step} placeholder")
    p.add_argument("--steps", required=True,
                   help="comma-separated step numbers to evaluate")
    p.add_argument("--opponent", default="maximin-2")
    p.add_argument("--games", type=int, default=400)
    p.add_argument("--init-rand-steps", type=int, default=10)
    p.add_argument("--lookahead", action="store_true",
                   help="evaluate each snapshot with the 1-ply value "
                        "lookahead operator (feed-forward only)")
    p.add_argument("--seed", type=int, default=0)
    args, _ = p.parse_known_args(argv)

    cfg = EnvConfig()
    opp = policy_from_spec(args.opponent, cfg, num_games=args.games // 2)
    n = args.games // 2
    steps = [int(s) for s in args.steps.split(",")]

    run = None
    for step in steps:
        path = args.glob.format(step=step)
        try:
            params, apply_fn, desc = load_eval_policy(path, cfg)
        except FileNotFoundError:
            print(f"step {step}: {path} missing, skipped")
            continue
        if run is None:
            recurrent = getattr(apply_fn, "recurrent", False)

            @jax.jit
            def run(params, key):
                k1, k2 = jax.random.split(key)
                if recurrent:
                    from gymothelloenv_tpu.train.ppo_trainer import (
                        play_games_recurrent)
                    as_black = play_games_recurrent(
                        k1, cfg, params, apply_fn, opp, n, -1,
                        args.init_rand_steps, apply_fn.hidden_size)
                    as_white = play_games_recurrent(
                        k2, cfg, params, apply_fn, opp, n, 1,
                        args.init_rand_steps, apply_fn.hidden_size)
                    wins = (as_black == -1).sum() + (as_white == 1).sum()
                    draws = (as_black == 0).sum() + (as_white == 0).sum()
                    return wins, draws
                if args.lookahead:
                    from gymothelloenv_tpu.policies.chunking import (
                        live_cost_of_spec, maybe_chunked)
                    from gymothelloenv_tpu.train.ppo_trainer import (
                        net_lookahead_policy)
                    net_act = maybe_chunked(
                        net_lookahead_policy(
                            params, apply_fn,
                            EnvConfig(num_disk_as_reward=True)),
                        n, live_cost_of_spec("", lookahead_depth=1))
                else:
                    net_act = net_tournament_policy(params, apply_fn)
                as_black = play_games_impl(k1, cfg, net_act, opp, n,
                                           args.init_rand_steps)
                as_white = play_games_impl(k2, cfg, opp, net_act, n,
                                           args.init_rand_steps)
                wins = (as_black == -1).sum() + (as_white == 1).sum()
                draws = (as_black == 0).sum() + (as_white == 0).sum()
                return wins, draws
        t0 = time.time()
        wins, draws = run(params, jax.random.PRNGKey(args.seed + step))
        wins, draws = int(wins), int(draws)
        losses = 2 * n - wins - draws
        print(f"step {step}: vs {args.opponent} {wins}/{draws}/{losses} "
              f"win%={wins / (2 * n):.3f}  [{time.time() - t0:.1f}s]",
              flush=True)


if __name__ == "__main__":
    main()
