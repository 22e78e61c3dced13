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
    ops = summarize_trace(trace_dir)
    print(format_op_table(ops))

    # Attribute unsourced fusions (round-5 VERDICT item 6: name the
    # 30 ms fusion): find each top op's definition in the compiled HLO
    # and print its fused computation body.
    txt = fn.lower(jax.random.PRNGKey(3)).compile().as_text()
    lines = txt.splitlines()
    for op in ops[:10]:
        if not op.source:
            defs = [ln for ln in lines
                    if f"%{op.name} = " in ln or f" {op.name} = " in ln]
            print(f"\n=== HLO def of {op.name} "
                  f"({op.total_us / 1000:.2f} ms x{op.count}) ===")
            for d in defs[:2]:
                print(d.strip()[:400])
                import re as _re
                m = _re.search(r"calls=%?([\w.\-]+)", d)
                if m:
                    cname = m.group(1)
                    for j, ln in enumerate(lines):
                        if ln.lstrip().startswith(f"%{cname} ") or \
                                ln.lstrip().startswith(f"{cname} "):
                            k = j
                            while k < len(lines) and lines[k].strip() != "}":
                                print("   ", lines[k].strip()[:220])
                                k += 1
                                if k - j > 60:
                                    print("    ... (truncated)")
                                    break
                            break


if __name__ == "__main__":
    main()
