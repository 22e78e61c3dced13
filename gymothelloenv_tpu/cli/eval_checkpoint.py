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

from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.ppo_trainer import (load_eval_policy,
                                                 net_tournament_policy)
from gymothelloenv_tpu.train.tournament import play_games_impl


def main(argv=None):
    from gymothelloenv_tpu.cli.tournament import policy_from_spec
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()   # absorb the axon tunnel init before queuing big programs
    parser = argparse.ArgumentParser()
    parser.add_argument("--load", type=str, required=True)
    parser.add_argument("--opponent", type=str, default="greedy",
                        help="rand | greedy | maximin-<k> | "
                             "ckpt:<path> / *.msgpack / *.pth "
                             "(head-to-head vs another checkpoint)")
    parser.add_argument("--games", type=int, default=200,
                        help="total games; half as black, half as white")
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--init-rand-steps", type=int, default=10)
    parser.add_argument("--lookahead", action="store_true",
                        help="1-ply value lookahead at eval time: expand "
                             "every legal move, score children with the "
                             "value head (terminal children with the true "
                             "reward), play the argmax")
    parser.add_argument("--lookahead-depth", type=int, default=1,
                        choices=(1, 2, 3),
                        help="value-lookahead search depth (2 = full "
                             "opponent-reply minimax over A^2 "
                             "grandchildren; 3 = beam search — exact "
                             "depth-2 backup under the --beam-k best "
                             "children by depth-1 value; implies "
                             "--lookahead)")
    parser.add_argument("--beam-k", type=int, default=8,
                        help="beam width for depth-3 lookahead (64 = "
                             "exact full depth 3)")
    parser.add_argument("--opp-lookahead-depth", type=int, default=0,
                        choices=(0, 1, 2, 3),
                        help="give a CHECKPOINT opponent the value-"
                             "lookahead operator too (0 = raw sampling; "
                             "best-vs-best head-to-heads)")
    parser.add_argument("--expand-chunk", type=int, default=0,
                        help="game-chunk size for deep-search policies "
                             "(lookahead / maximin-2+): 0 = auto from "
                             "the memory cost model, <0 = unchunked")
    parser.add_argument("--seed", type=int, default=0)
    args, _ = parser.parse_known_args(argv)
    if args.lookahead_depth > 1:
        args.lookahead = True

    cfg = EnvConfig(board_size=args.board_size)
    params, apply_fn, desc = load_eval_policy(args.load, cfg)
    print(f"loaded {args.load} ({desc})")

    opp_spec = args.opponent
    opp_params = opp_apply = None
    if opp_spec.startswith("ckpt:") or opp_spec.endswith(
            (".msgpack", ".pth", ".pt")):
        # Head-to-head: the opponent is another checkpoint (native or
        # reference torch, feed-forward or recurrent), sampling like the
        # protagonist.
        opp_path = opp_spec.removeprefix("ckpt:")
        opp_params, opp_apply, opp_desc = load_eval_policy(opp_path, cfg)
        print(f"opponent checkpoint {opp_path} ({opp_desc})")
    n = args.games // 2

    recurrent = getattr(apply_fn, "recurrent", False)
    opp_recurrent = getattr(opp_apply, "recurrent", False)
    # Lookahead scores children on the TRAINING reward scale so terminal
    # rewards and value estimates are commensurable.
    lookahead_cfg = EnvConfig(board_size=args.board_size,
                              num_disk_as_reward=True)

    from gymothelloenv_tpu.policies.chunking import (live_cost_of_spec,
                                                     maybe_chunked)
    from gymothelloenv_tpu.train.ppo_trainer import (
        net_lookahead_cell_recurrent, net_lookahead_policy,
        net_sampling_cell, play_games_recurrent)

    opp_la = args.opp_lookahead_depth
    if opp_la and opp_apply is None:
        parser.error("--opp-lookahead-depth needs a checkpoint opponent "
                     "(ckpt:<path> / *.msgpack / *.pth)")
    if opp_la and opp_recurrent and opp_la != 1:
        parser.error("recurrent opponents support lookahead depth 1 only")
    if opp_apply is not None:
        if opp_recurrent:
            opp = None
        elif opp_la:
            opp = net_lookahead_policy(opp_params, opp_apply,
                                       lookahead_cfg, depth=opp_la,
                                       beam_k=args.beam_k)
            opp = maybe_chunked(
                opp, n, live_cost_of_spec("", lookahead_depth=opp_la,
                                          beam_k=args.beam_k),
                chunk_override=args.expand_chunk,
                label=f"opp-lookahead-{opp_la}")
        else:
            opp = net_tournament_policy(opp_params, opp_apply)
    else:
        opp = policy_from_spec(opp_spec, cfg, num_games=n,
                               expand_chunk=args.expand_chunk)

    # Protagonist as a stateless policy (feed-forward paths).
    if not recurrent:
        if args.lookahead:
            net_act = net_lookahead_policy(params, apply_fn,
                                           lookahead_cfg,
                                           depth=args.lookahead_depth,
                                           beam_k=args.beam_k)
            net_act = maybe_chunked(
                net_act, n,
                live_cost_of_spec("",
                                  lookahead_depth=args.lookahead_depth,
                                  beam_k=args.beam_k),
                chunk_override=args.expand_chunk,
                label=f"lookahead-{args.lookahead_depth}")
        else:
            net_act = net_tournament_policy(params, apply_fn)

    def make_run(n_seg):
        @functools.partial(jax.jit, static_argnames=())
        def run(params, key):
            def play(k, prot_color):
                """``n_seg`` games with the protagonist on
                ``prot_color``; returns winners."""
                if recurrent:
                    cell = (net_lookahead_cell_recurrent(
                                params, apply_fn, lookahead_cfg,
                                depth=args.lookahead_depth)
                            if args.lookahead else None)
                    if opp_recurrent:
                        opp_cell = (net_lookahead_cell_recurrent(
                                        opp_params, opp_apply,
                                        lookahead_cfg, depth=1)
                                    if opp_la else
                                    net_sampling_cell(opp_params,
                                                      opp_apply))
                    else:
                        opp_cell = None
                    return play_games_recurrent(
                        k, cfg, params, apply_fn, opp, n_seg, prot_color,
                        args.init_rand_steps, apply_fn.hidden_size,
                        act_cell=cell, opp_cell=opp_cell,
                        opp_hidden_size=(opp_apply.hidden_size
                                         if opp_recurrent else 0))
                if opp_recurrent:
                    # Feed-forward protagonist vs recurrent opponent:
                    # run the stateful runner with the roles swapped
                    # (the recurrent side is its "net").
                    opp_act_cell = (net_lookahead_cell_recurrent(
                                        opp_params, opp_apply,
                                        lookahead_cfg, depth=1)
                                    if opp_la else None)
                    return play_games_recurrent(
                        k, cfg, opp_params, opp_apply, net_act, n_seg,
                        -prot_color, args.init_rand_steps,
                        opp_apply.hidden_size, act_cell=opp_act_cell)
                black, white = ((net_act, opp) if prot_color == -1
                                else (opp, net_act))
                return play_games_impl(k, cfg, black, white, n_seg,
                                       args.init_rand_steps)

            k1, k2 = jax.random.split(key)
            as_black = play(k1, -1)
            as_white = play(k2, 1)
            wins = (as_black == -1).sum() + (as_white == 1).sum()
            draws = (as_black == 0).sum() + (as_white == 0).sum()
            return wins, draws
        return run

    # Memory-model entry for programs that can't be device-chunked:
    # depth>=4 maximin opponents run full-vmap in host-side segments of
    # the proven-safe size, and RECURRENT lookahead actors (protagonist
    # or armed recurrent opponent) — whose 64-child GRU expansion lives
    # inside the stateful game loop where chunked_batched can't reach —
    # bound the games-per-program so segment x per-game cost fits the
    # live budget (each segment's hiddens start at zero, so segmentation
    # is exact).  Everything else is one program.
    from gymothelloenv_tpu.policies.chunking import (COST_LOOKAHEAD_1,
                                                     host_segment_size,
                                                     total_cost_of_spec)
    cell_cost = 0
    if recurrent and args.lookahead:
        cell_cost += COST_LOOKAHEAD_1
    if opp_recurrent and opp_la:
        cell_cost += COST_LOOKAHEAD_1
    # Both sides' deep searches count toward the per-program
    # total-expansion ceiling (a beam-3 protagonist + maximin-3
    # opponent program at 100 games crossed it, log 54).
    costs = [opp_spec if opp_apply is None else
             (total_cost_of_spec("", lookahead_depth=opp_la,
                                 beam_k=args.beam_k)
              if opp_la and not opp_recurrent else 0)]
    if not recurrent and args.lookahead:
        costs.append(total_cost_of_spec(
            "", lookahead_depth=args.lookahead_depth,
            beam_k=args.beam_k))
    seg = host_segment_size(costs, n, cell_cost=cell_cost)

    t0 = time.time()
    key = jax.random.PRNGKey(args.seed)
    wins = draws = 0
    left, runners = n, {}
    while left > 0:
        n_seg = min(seg, left)
        if n_seg not in runners:
            runners[n_seg] = make_run(n_seg)
        key, sub = jax.random.split(key)
        w, dr = runners[n_seg](params, sub)
        wins, draws = wins + int(w), draws + int(dr)
        left -= n_seg
    losses = 2 * n - wins - draws
    print(f"checkpoint vs {args.opponent}: {wins} / {draws} / {losses} "
          f"(W/D/L over {2 * n} games, half each color)  "
          f"win%={wins / (2 * n):.3f}  [{time.time() - t0:.1f}s]")


if __name__ == "__main__":
    main()
