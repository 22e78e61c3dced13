"""Rainbow training CLI — the runnable replacement for the reference's
default-but-absent ``rainbow`` protagonist (util.py:42-43,
run_self_play.py:293 default; the external ``Rainbow.agent`` package the
reference imports does not exist in the snapshot).

Usage:
    python -m gymothelloenv_tpu.cli.rainbow_train --num-chunks 500 \
        --opponent greedy
"""

from __future__ import annotations

import argparse

import jax

from gymothelloenv_tpu.agents.rainbow import RainbowConfig
from gymothelloenv_tpu.agents.replay import ReplayConfig
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.dqn_trainer import DQNRunConfig
from gymothelloenv_tpu.train.rainbow_trainer import RainbowTrainer
from gymothelloenv_tpu.utils.logging import MetricsLogger


def main(argv=None):
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()   # absorb the axon tunnel init before queuing big programs
    parser = argparse.ArgumentParser()
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--num-envs", type=int, default=128)
    parser.add_argument("--chunk-plies", type=int, default=64)
    parser.add_argument("--num-chunks", type=int, default=500)
    parser.add_argument("--opponent", type=str, default="",
                        help="''=self-play | rand | greedy")
    parser.add_argument("--n-step", type=int, default=3)
    parser.add_argument("--num-atoms", type=int, default=51)
    parser.add_argument("--lr", type=float, default=6.25e-5)
    parser.add_argument("--gamma", type=float, default=0.99)
    parser.add_argument("--replay-size", type=int, default=1_000_000)
    parser.add_argument("--initial-replay-size", type=int, default=20000)
    parser.add_argument("--target-update-interval", type=int, default=10000)
    parser.add_argument("--init-rand-steps", type=int, default=0)
    parser.add_argument("--num-test-games", type=int, default=200)
    parser.add_argument("--test-interval", type=int, default=50)
    parser.add_argument("--opponent-pool", type=int, default=0,
                        help="league-lite: >0 plays the non-learning "
                             "color greedily from a random frozen "
                             "snapshot of the last K pool entries "
                             "(0 = shared mirror self-play)")
    parser.add_argument("--pool-interval", type=int, default=100,
                        help="chunks between pool snapshots")
    parser.add_argument("--save-interval", type=int, default=200,
                        help="chunks between checkpoint saves; a "
                             "{step} placeholder in --checkpoint "
                             "keeps one file per snapshot")
    parser.add_argument("--data-parallel", type=int, default=0,
                        help="shard the chunk over this many devices "
                             "(0 = no mesh)")
    parser.add_argument("--replay-sharding", default="replicated",
                        choices=("replicated", "per-shard"),
                        help="replay layout under --data-parallel (see "
                             "cli.dqn_train; Rainbow uses the same "
                             "per-shard driver with its C51 core)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--load", type=str, default="")
    parser.add_argument("--log-dir", type=str, default="")
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=32,
                        help="train minibatch (reference: 32; raise with "
                             "--train-interval for TPU-sized throughput "
                             "mode at the same data/update ratio)")
    parser.add_argument("--train-interval", type=int, default=4,
                        help="transitions per update (dqn.py:353-354)")
    args, _ = parser.parse_known_args(argv)

    env_cfg = EnvConfig(board_size=args.board_size, num_disk_as_reward=True)
    rainbow_cfg = RainbowConfig(
        board_size=args.board_size, gamma=args.gamma, n_step=args.n_step,
        num_atoms=args.num_atoms, lr=args.lr,
        initial_replay_size=args.initial_replay_size,
        target_update_interval=args.target_update_interval,
        batch_size=args.batch_size, train_interval=args.train_interval)
    rb_cfg = ReplayConfig(capacity=args.replay_size,
                          board_size=args.board_size, prioritized=True)
    run_cfg = DQNRunConfig(
        num_envs=args.num_envs, chunk_plies=args.chunk_plies,
        opponent=args.opponent or None,
        init_rand_steps=args.init_rand_steps,
        opponent_pool=args.opponent_pool,
        pool_interval=args.pool_interval,
        num_test_games=args.num_test_games,
        test_interval=args.test_interval,
        save_interval=args.save_interval, seed=args.seed,
        replay_sharding=args.replay_sharding)

    mesh = None
    if args.data_parallel:
        from gymothelloenv_tpu.parallel import make_mesh
        mesh = make_mesh(args.data_parallel)
    elif args.replay_sharding != "replicated":
        parser.error("--replay-sharding per-shard requires "
                     "--data-parallel")

    logger = MetricsLogger(args.log_dir) if args.log_dir else None
    trainer = RainbowTrainer(env_cfg=env_cfg, rainbow_cfg=rainbow_cfg,
                             rb_cfg=rb_cfg, run_cfg=run_cfg,
                             log_fn=logger.log if logger else None,
                             mesh=mesh)
    if args.load:
        trainer.load(args.load)
        print(f"resumed from {args.load} at chunk {trainer.chunk_count}")

    print(f"devices: {jax.devices()}")
    trainer.train(args.num_chunks, log_every=args.log_every,
                  checkpoint_path=args.checkpoint or None)
    print("final eval:", trainer.evaluate())


if __name__ == "__main__":
    main()
