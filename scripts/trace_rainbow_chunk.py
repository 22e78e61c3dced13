"""Device-trace one Rainbow train_chunk and print the per-HLO breakdown
(C51 + noisy nets + PER at throughput-mode sizes).

Usage: python scripts/trace_rainbow_chunk.py [N] [--batch=4096]
       [--interval=512]
"""

from __future__ import annotations

import sys
import tempfile

import jax

from gymothelloenv_tpu.utils import tpu
from gymothelloenv_tpu.utils.profiling import (format_op_table,
                                               summarize_trace)


def main():
    tpu.warmup()
    from gymothelloenv_tpu.agents.rainbow import RainbowConfig
    from gymothelloenv_tpu.agents.replay import ReplayConfig
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.dqn_trainer import DQNRunConfig
    from gymothelloenv_tpu.train.rainbow_trainer import RainbowTrainer

    argv = sys.argv[1:]
    batch = next((int(a.split("=")[1]) for a in argv
                  if a.startswith("--batch=")), 4096)
    interval = next((int(a.split("=")[1]) for a in argv
                     if a.startswith("--interval=")), 512)
    pos = [a for a in argv if not a.startswith("--")]
    N = int(pos[0]) if pos else 1024

    trainer = RainbowTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        rainbow_cfg=RainbowConfig(batch_size=batch,
                                  train_interval=interval,
                                  initial_replay_size=0),
        rb_cfg=ReplayConfig(capacity=1_000_000, prioritized=True),
        run_cfg=DQNRunConfig(num_envs=N, seed=0),
        log_fn=lambda step, m: None)
    trainer.ensure_initialized()
    trainer.train(num_chunks=2, log_every=10)

    def chunk_once(key):
        agent, replay, roll, metrics = trainer._train_chunk.__wrapped__(
            trainer.agent, trainer.replay, trainer.roll, key)
        return metrics["loss"]

    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_rainbow_")
    fn = jax.jit(chunk_once)
    float(fn(jax.random.PRNGKey(1)))
    with jax.profiler.trace(trace_dir):
        float(fn(jax.random.PRNGKey(2)))
    print("trace dir:", trace_dir, flush=True)
    print(format_op_table(summarize_trace(trace_dir)))


if __name__ == "__main__":
    main()
