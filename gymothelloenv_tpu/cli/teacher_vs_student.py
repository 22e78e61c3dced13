"""Teacher-vs-student training CLI — rebuild of
``ppo_run_teacher_vs_student.py`` (and the single-proc
``run_teacher_vs_student.py``) on the on-device two-role trainer.

Usage:
    python -m gymothelloenv_tpu.cli.teacher_vs_student --num-chunks 2000 \
        --teacher-load data/selfplay/ppo.msgpack
"""

from __future__ import annotations

import argparse

import jax

from gymothelloenv_tpu.agents.ppo import PPOConfig
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.teacher_student import (TeacherStudentConfig,
                                                     TeacherStudentTrainer)
from gymothelloenv_tpu.utils.logging import MetricsLogger


def main(argv=None):
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()   # absorb the axon tunnel init before queuing big programs
    parser = argparse.ArgumentParser()
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--num-envs", type=int, default=128)
    parser.add_argument("--num-steps", type=int, default=32)
    parser.add_argument("--num-chunks", type=int, default=2000)
    parser.add_argument("--lr", type=float, default=5e-6)
    parser.add_argument("--clip-param", type=float, default=0.1)
    parser.add_argument("--entropy-coef", type=float, default=None,
                        help="override PPOConfig.entropy_coef")
    parser.add_argument("--hidden-size", type=int, default=512)
    parser.add_argument("--width-mult", type=int, default=1,
                        help="trunk channel multiplier (2 matches the "
                             "wide2 self-play checkpoints for "
                             "--teacher-load warm starts)")
    parser.add_argument("--save-interval", type=int, default=200,
                        help="chunks between --checkpoint saves "
                             "({step} in the path keeps snapshots)")
    parser.add_argument("--no-train-teacher", action="store_true")
    parser.add_argument("--teacher-load", type=str, default="",
                        help="self-play checkpoint to warm-start the "
                             "teacher")
    parser.add_argument("--load", type=str, default="")
    parser.add_argument("--init-rand-steps", type=int, default=0)
    parser.add_argument("--num-test-games", type=int, default=200)
    parser.add_argument("--test-interval", type=int, default=10)
    parser.add_argument("--teacher-test-interval", type=int, default=200)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--log-dir", type=str, default="")
    parser.add_argument("--log-every", type=int, default=10)
    args, _ = parser.parse_known_args(argv)

    env_cfg = EnvConfig(board_size=args.board_size, num_disk_as_reward=True)
    ppo_kw = dict(lr=args.lr, clip_param=args.clip_param,
                  num_updates=args.num_chunks)
    if args.entropy_coef is not None:
        ppo_kw["entropy_coef"] = args.entropy_coef
    ppo_cfg = PPOConfig(**ppo_kw)
    run_cfg = TeacherStudentConfig(
        num_envs=args.num_envs, num_steps=args.num_steps,
        train_teacher=not args.no_train_teacher,
        init_rand_steps=args.init_rand_steps,
        num_test_games=args.num_test_games,
        test_interval=args.test_interval,
        teacher_test_interval=args.teacher_test_interval, seed=args.seed,
        save_interval=args.save_interval,
        hidden_size=args.hidden_size, width_mult=args.width_mult)

    logger = MetricsLogger(args.log_dir) if args.log_dir else None
    trainer = TeacherStudentTrainer(env_cfg=env_cfg, ppo_cfg=ppo_cfg,
                                    run_cfg=run_cfg,
                                    log_fn=logger.log if logger else None)
    if args.teacher_load:
        trainer.load_teacher(args.teacher_load)
        print(f"teacher warm-started from {args.teacher_load}")
    if args.load:
        trainer.load(args.load)

    print(f"devices: {jax.devices()}")
    trainer.train(args.num_chunks, log_every=args.log_every,
                  checkpoint_path=args.checkpoint or None)
    print("final student eval:", trainer.evaluate_student())


if __name__ == "__main__":
    main()
