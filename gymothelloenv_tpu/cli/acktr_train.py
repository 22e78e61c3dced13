"""ACKTR self-play training CLI — K-FAC natural-gradient actor-critic
(the vendored ``--algo acktr`` path, unrunnable in the reference's
masked-model fork; works here).

Usage:
    python -m gymothelloenv_tpu.cli.acktr_train --num-updates 2000
"""

from __future__ import annotations

import argparse

import jax

from gymothelloenv_tpu.agents.kfac import ACKTRConfig
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.acktr_trainer import ACKTRSelfPlayTrainer
from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig
from gymothelloenv_tpu.utils.logging import MetricsLogger


def main(argv=None):
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()
    parser = argparse.ArgumentParser()
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--num-envs", type=int, default=256)
    parser.add_argument("--num-steps", type=int, default=5)
    parser.add_argument("--num-updates", type=int, default=2000)
    parser.add_argument("--lr", type=float, default=0.25)
    parser.add_argument("--kl-clip", type=float, default=0.001)
    parser.add_argument("--entropy-coef", type=float, default=0.01,
                        help="entropy bonus (kfac cfg; the round-2 run's "
                             "entropy collapsed 2.4->0.01 by update 1500 "
                             "— raise to keep self-play exploratory)")
    parser.add_argument("--damping", type=float, default=1e-2)
    parser.add_argument("--checkpoint", type=str, default="",
                        help="msgpack path; may contain {step}")
    parser.add_argument("--save-interval", type=int, default=1000)
    parser.add_argument("--test-interval", type=int, default=500)
    parser.add_argument("--num-test-games", type=int, default=200)
    parser.add_argument("--net", choices=("mlp", "conv"), default="mlp",
                        help="actor-critic towers: tanh-MLP (MLPBase) or "
                             "CNNBase-shaped conv with KFC factors")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--log-dir", type=str, default="")
    parser.add_argument("--log-every", type=int, default=50)
    args, _ = parser.parse_known_args(argv)

    trainer = ACKTRSelfPlayTrainer(
        acktr_cfg=ACKTRConfig(lr=args.lr, kl_clip=args.kl_clip,
                              entropy_coef=args.entropy_coef,
                              damping=args.damping),
        env_cfg=EnvConfig(board_size=args.board_size,
                          num_disk_as_reward=True),
        run_cfg=SelfPlayConfig(
            num_envs=args.num_envs, num_steps=args.num_steps,
            test_interval=args.test_interval,
            num_test_games=args.num_test_games,
            save_interval=args.save_interval, seed=args.seed),
        log_fn=(MetricsLogger(args.log_dir).log if args.log_dir
                else None),
        net=args.net)
    print(f"devices: {jax.devices()}")
    trainer.train(args.num_updates, log_every=args.log_every,
                  checkpoint_path=args.checkpoint or None)
    print("final eval:", trainer.evaluate())


if __name__ == "__main__":
    main()
