"""Device-trace the FULL PPO train step (rollout collection + update) and
print the per-HLO breakdown — the collection-side companion of
trace_update.py.

Usage: python scripts/trace_train_step.py [N] [--bf16]
"""

from __future__ import annotations

import sys
import tempfile

import jax

from gymothelloenv_tpu.utils import tpu
from trace_update import capture, summarize


def main():
    tpu.warmup()
    from gymothelloenv_tpu.agents.ppo import PPOConfig
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                     SelfPlayConfig)

    argv = sys.argv[1:]
    bf16 = "--bf16" in argv
    pos = [a for a in argv if not a.startswith("--")]
    N = int(pos[0]) if pos else 4096

    trainer = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=10),
        run_cfg=SelfPlayConfig(num_envs=N, bf16=bf16))
    trainer.ensure_initialized()

    # Re-jit the raw step WITHOUT donation so capture can re-run it on the
    # same buffers.
    def step_once(key):
        p, o, s, metrics = trainer._train_step.__wrapped__(
            trainer.params, trainer.opt_state, trainer.sp_state, key)
        return metrics["value_loss"]

    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_full_")
    capture(step_once, (jax.random.PRNGKey(3),), trace_dir)
    print("trace dir:", trace_dir, flush=True)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
