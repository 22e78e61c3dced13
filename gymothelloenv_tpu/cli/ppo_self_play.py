"""PPO self-play training CLI — the rebuild of ``ppo_run_self_play.py``.

Usage:
    python -m gymothelloenv_tpu.cli.ppo_self_play --num-updates 1000 \
        --num-envs 256 --checkpoint data/selfplay/ppo.msgpack
"""

from __future__ import annotations

import argparse

import jax

from gymothelloenv_tpu.agents.ppo import PPOConfig
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                 SelfPlayConfig)
from gymothelloenv_tpu.utils.logging import MetricsLogger


def main(argv=None):
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()   # absorb the axon tunnel init before queuing big programs
    parser = argparse.ArgumentParser()
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--num-envs", type=int, default=256)
    parser.add_argument("--num-steps", type=int, default=64)
    parser.add_argument("--num-updates", type=int, default=1000)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--clip-param", type=float, default=0.1)
    parser.add_argument("--entropy-coef", type=float, default=0.0)
    parser.add_argument("--gamma", type=float, default=0.99)
    parser.add_argument("--gae-lambda", type=float, default=0.95)
    parser.add_argument("--ppo-epochs", type=int, default=4)
    parser.add_argument("--num-mini-batch", type=int, default=4)
    parser.add_argument("--no-linear-lr-decay", action="store_true")
    parser.add_argument("--init-rand-steps", type=int, default=0)
    parser.add_argument("--test-init-rand-steps", type=int, default=10)
    parser.add_argument("--num-test-games", type=int, default=200)
    parser.add_argument("--test-interval", type=int, default=100)
    parser.add_argument("--save-interval", type=int, default=500)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint", type=str, default="",
                        help="save path; a {step} placeholder keeps one "
                             "file per save-interval snapshot")
    parser.add_argument("--load", type=str, default="")
    parser.add_argument("--reset-opt", action="store_true",
                        help="with --load: restore params only and "
                             "reinitialize optimizer + update counter "
                             "(fine-tune under a new schedule/objective)")
    parser.add_argument("--log-dir", type=str, default="")
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--hidden-size", type=int, default=512,
                        help="fc width (512 = reference parity)")
    parser.add_argument("--width-mult", type=int, default=1,
                        help="trunk channel multiplier (1 = parity "
                             "32/64/64; RESULTS.md documents a strength "
                             "plateau at parity capacity)")
    parser.add_argument("--opponent-pool", type=int, default=0,
                        help="league-lite: >0 plays the non-learning "
                             "color with a random snapshot from the last "
                             "K pool entries (0 = reference mirror "
                             "self-play)")
    parser.add_argument("--pool-interval", type=int, default=250,
                        help="updates between pool snapshots")
    parser.add_argument("--pool-anchor", action="append", default=[],
                        metavar="CKPT",
                        help="external checkpoint mixed PERMANENTLY into "
                             "the opponent pool (repeatable; same "
                             "architecture as the training net; needs "
                             "--opponent-pool > 0).  Anchors pin a broad "
                             "opponent distribution during, e.g., "
                             "--lookahead-collect training")
    parser.add_argument("--chain-updates", type=int, default=1,
                        help="scan K train steps per jitted dispatch "
                             "(amortizes ~4ms/step tunnel overhead; "
                             "eval/save cadence quantizes to K and the "
                             "run length rounds UP to a multiple of K)")
    parser.add_argument("--recurrent", action="store_true",
                        help="GRU-recurrent policy (model.py:230-285 "
                             "rebuilt; hidden state threaded through "
                             "collection, env-subset minibatches — "
                             "num-envs must divide by num-mini-batch)")
    parser.add_argument("--frame-stack", type=int, default=1,
                        help="stack the last K observations over "
                             "channels (VecPyTorchFrameStack, vendored "
                             "envs.py:210-250); 1 = off.  Rides the "
                             "recurrent machinery — num-envs must "
                             "divide by num-mini-batch")
    parser.add_argument("--max-episode-plies", type=int, default=0,
                        help="truncate episodes after this many "
                             "protagonist decisions with proper-time-"
                             "limit GAE (TimeLimitMask + storage.py "
                             "bad_masks semantics); 0 = off")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 net compute (params stay fp32; "
                             "~17%% faster updates at num-envs 4096)")
    parser.add_argument("--lookahead-collect", action="store_true",
                        help="search-bootstrapped training: the "
                             "protagonist ACTS with the 1-ply value "
                             "lookahead while the update trains the raw "
                             "net (pair with --distill for approximate "
                             "policy iteration)")
    parser.add_argument("--lookahead-mix", type=float, default=1.0,
                        help="fraction of updates whose collection uses "
                             "the lookahead override (deterministic "
                             "interleave; 0.5 alternates plain and "
                             "search-guided collection)")
    parser.add_argument("--lookahead-tau", type=float, default=0.0,
                        help="softmax temperature over child values for "
                             "--lookahead-collect (0 = argmax; value "
                             "scale is disk diffs, ±64)")
    parser.add_argument("--distill", action="store_true",
                        help="cross-entropy-to-taken-action update "
                             "instead of the clipped surrogate (for "
                             "--lookahead-collect distillation)")
    args, _ = parser.parse_known_args(argv)

    env_cfg = EnvConfig(board_size=args.board_size, num_disk_as_reward=True)
    ppo_cfg = PPOConfig(
        lr=args.lr, clip_param=args.clip_param,
        entropy_coef=args.entropy_coef, gamma=args.gamma,
        gae_lambda=args.gae_lambda, ppo_epochs=args.ppo_epochs,
        num_mini_batch=args.num_mini_batch,
        use_linear_lr_decay=not args.no_linear_lr_decay,
        num_updates=args.num_updates, distill=args.distill)
    run_cfg = SelfPlayConfig(
        num_envs=args.num_envs, num_steps=args.num_steps,
        init_rand_steps=args.init_rand_steps,
        test_init_rand_steps=args.test_init_rand_steps,
        num_test_games=args.num_test_games,
        test_interval=args.test_interval,
        save_interval=args.save_interval, seed=args.seed,
        bf16=args.bf16, hidden_size=args.hidden_size,
        width_mult=args.width_mult, opponent_pool=args.opponent_pool,
        pool_interval=args.pool_interval,
        pool_anchors=tuple(args.pool_anchor), recurrent=args.recurrent,
        frame_stack=args.frame_stack,
        max_episode_plies=args.max_episode_plies,
        chain_updates=args.chain_updates,
        lookahead_collect=args.lookahead_collect,
        lookahead_tau=args.lookahead_tau,
        lookahead_mix=args.lookahead_mix)

    logger = MetricsLogger(args.log_dir) if args.log_dir else None
    trainer = PPOSelfPlayTrainer(
        env_cfg=env_cfg, ppo_cfg=ppo_cfg, run_cfg=run_cfg,
        log_fn=logger.log if logger else None)
    if args.load and args.reset_opt:
        trainer.load_params_only(args.load)
        print(f"warm-started params from {args.load} (fresh optimizer)")
    elif args.load:
        trainer.load(args.load)
        print(f"resumed from {args.load} at update {trainer.update_count}")

    print(f"devices: {jax.devices()}")
    trainer.train(args.num_updates, log_every=args.log_every,
                  checkpoint_path=args.checkpoint or None)
    print("final eval:", trainer.evaluate())


if __name__ == "__main__":
    main()
