"""Evaluate a saved PPO policy checkpoint against a scripted opponent —
the rebuild of the vendored ``evaluation.py`` (10-episode deterministic
eval) generalized to the on-device tournament runner, and the measurement
entry for the BASELINE.json headline "PPO self-play win-rate vs Maximin-2".

Usage:
    python -m gymothelloenv_tpu.cli.eval_checkpoint \
        --load data/ppo_tpu_run.msgpack --opponent maximin-2 --games 200

``--load`` also accepts REFERENCE torch checkpoints (.pth/.pt — a saved
``actor_critic`` module or a util.save dict of the vendored Policy); the
weights are converted via ``compat.torch_import`` so users can evaluate
models trained with the original code on TPU directly.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                 make_network,
                                                 net_tournament_policy)
from gymothelloenv_tpu.train.tournament import play_games_impl
from gymothelloenv_tpu.utils.checkpoint import load_checkpoint


def main(argv=None):
    from gymothelloenv_tpu.cli.tournament import policy_from_spec
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()   # absorb the axon tunnel init before queuing big programs
    parser = argparse.ArgumentParser()
    parser.add_argument("--load", type=str, required=True)
    parser.add_argument("--opponent", type=str, default="greedy",
                        help="rand | greedy | maximin-<k>")
    parser.add_argument("--games", type=int, default=200,
                        help="total games; half as black, half as white")
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--init-rand-steps", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    args, _ = parser.parse_known_args(argv)

    cfg = EnvConfig(board_size=args.board_size)
    if args.load.endswith((".pth", ".pt")):
        from gymothelloenv_tpu.compat.torch_import import (
            detect_and_import, imported_apply_fn, load_torch_checkpoint)
        kind, params = detect_and_import(load_torch_checkpoint(args.load))
        print(f"imported reference torch checkpoint {args.load} "
              f"(architecture: {kind})")
        apply_fn = imported_apply_fn(kind, cfg)
    else:
        # Infer the net's capacity knobs from the stored param shapes so
        # non-default --hidden-size/--width-mult checkpoints just work.
        raw_step, raw_params, _, _ = load_checkpoint(args.load)
        trunk = raw_params["params"]["ConvTrunk_0"]
        width_mult = int(trunk["Conv_0"]["kernel"].shape[-1]) // 32
        hidden_size = int(
            raw_params["params"]["Dense_0"]["kernel"].shape[-1])
        net = make_network(cfg, hidden_size=hidden_size,
                           width_mult=width_mult)
        apply_fn = make_apply_fn(net)
        dummy = jnp.zeros((1, 4, cfg.board_size, cfg.board_size))
        template = net.init(jax.random.PRNGKey(0), dummy)
        step, params, _, _ = load_checkpoint(args.load, template, None)
        extra = ("" if width_mult == 1 and hidden_size == 512 else
                 f", width_mult={width_mult}, hidden={hidden_size}")
        print(f"loaded {args.load} (step {step}{extra})")

    opp = policy_from_spec(args.opponent, cfg)
    n = args.games // 2

    @functools.partial(jax.jit, static_argnames=())
    def run(params, key):
        net_act = net_tournament_policy(params, apply_fn)
        k1, k2 = jax.random.split(key)
        as_black = play_games_impl(k1, cfg, net_act, opp, n,
                                   args.init_rand_steps)
        as_white = play_games_impl(k2, cfg, opp, net_act, n,
                                   args.init_rand_steps)
        wins = (as_black == -1).sum() + (as_white == 1).sum()
        draws = (as_black == 0).sum() + (as_white == 0).sum()
        return wins, draws

    t0 = time.time()
    wins, draws = run(params, jax.random.PRNGKey(args.seed))
    wins, draws = int(wins), int(draws)
    losses = 2 * n - wins - draws
    print(f"checkpoint vs {args.opponent}: {wins} / {draws} / {losses} "
          f"(W/D/L over {2 * n} games, half each color)  "
          f"win%={wins / (2 * n):.3f}  [{time.time() - t0:.1f}s]")


if __name__ == "__main__":
    main()
