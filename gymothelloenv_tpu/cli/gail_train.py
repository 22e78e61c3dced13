"""GAIL training CLI — adversarial imitation of a scripted expert
(the vendored main.py --gail path, dead in the reference, working here).

Usage:
    python scripts/make_expert_dataset.py --games 64 \
        --out data/expert_maximin2.npz
    python -m gymothelloenv_tpu.cli.gail_train \
        --expert data/expert_maximin2.npz --num-updates 500
"""

from __future__ import annotations

import argparse

import jax

from gymothelloenv_tpu.agents.ppo import PPOConfig
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.gail_trainer import (GAILPPOTrainer,
                                                  GAILRunConfig)
from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig
from gymothelloenv_tpu.utils.logging import MetricsLogger


def main(argv=None):
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()
    parser = argparse.ArgumentParser()
    parser.add_argument("--expert", type=str, required=True,
                        help="expert npz/h5 (scripts/make_expert_dataset)")
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--num-envs", type=int, default=256)
    parser.add_argument("--num-steps", type=int, default=64)
    parser.add_argument("--num-updates", type=int, default=500)
    parser.add_argument("--lr", type=float, default=1e-5)
    parser.add_argument("--gail-epoch", type=int, default=5)
    parser.add_argument("--gail-batch-size", type=int, default=128)
    parser.add_argument("--num-trajectories", type=int, default=4)
    parser.add_argument("--bc-updates", type=int, default=0,
                        help="behaviour-cloning pretrain steps on the "
                             "expert before adversarial training "
                             "(0 = off)")
    parser.add_argument("--subsample-frequency", type=int, default=4)
    parser.add_argument("--test-interval", type=int, default=100)
    parser.add_argument("--num-test-games", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--log-dir", type=str, default="")
    parser.add_argument("--log-every", type=int, default=10)
    args, _ = parser.parse_known_args(argv)

    env_cfg = EnvConfig(board_size=args.board_size,
                        num_disk_as_reward=True)
    ppo_cfg = PPOConfig(lr=args.lr, num_updates=args.num_updates)
    run_cfg = SelfPlayConfig(
        num_envs=args.num_envs, num_steps=args.num_steps,
        test_interval=args.test_interval,
        num_test_games=args.num_test_games, seed=args.seed)
    gail_run = GAILRunConfig(
        gail_epoch=args.gail_epoch,
        gail_batch_size=args.gail_batch_size,
        num_trajectories=args.num_trajectories,
        subsample_frequency=args.subsample_frequency)

    logger = MetricsLogger(args.log_dir) if args.log_dir else None
    trainer = GAILPPOTrainer(
        expert_path=args.expert, gail_run=gail_run, env_cfg=env_cfg,
        ppo_cfg=ppo_cfg, run_cfg=run_cfg,
        log_fn=logger.log if logger else None)
    print(f"devices: {jax.devices()}  expert rows: {len(trainer.expert)}")
    if args.bc_updates:
        trainer.bc_warmstart(args.bc_updates)
        print("BC warm-start eval:", trainer.evaluate())
    trainer.train(args.num_updates, log_every=args.log_every,
                  checkpoint_path=args.checkpoint or None)
    print("final eval:", trainer.evaluate())


if __name__ == "__main__":
    main()
