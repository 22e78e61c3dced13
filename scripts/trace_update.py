"""Capture a jax.profiler device trace of the full PPO update and print the
op-level time breakdown (top XLA ops by total device time).

The tunnel backend has no TensorBoard; ``utils.profiling.summarize_trace``
parses the perfetto trace.json.gz the profiler writes and aggregates
durations by op name, so update-tuning decisions are driven by measured
HLO costs, not guesses.

Usage: python scripts/trace_update.py [T] [N] [--bf16] [--impl=<trunk>]
"""

from __future__ import annotations

import sys
import tempfile

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.utils import tpu
from gymothelloenv_tpu.utils.profiling import (format_op_table,
                                               summarize_trace)


def capture(fn, args, trace_dir):
    out = jax.jit(fn)(*args)
    jax.tree.leaves(out)[0].block_until_ready()
    float(jax.tree.leaves(out)[0].sum().astype(jnp.float32))  # real sync
    with jax.profiler.trace(trace_dir):
        out = jax.jit(fn)(*args)
        float(jax.tree.leaves(out)[0].sum().astype(jnp.float32))


def summarize(trace_dir, top=45):
    print(format_op_table(summarize_trace(trace_dir), top=top))


def main():
    tpu.warmup()
    from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                              make_optimizer, ppo_update)
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                     make_network)

    argv = [a for a in sys.argv[1:]]
    bf16 = "--bf16" in argv
    impl = next((a.split("=", 1)[1] for a in argv
                 if a.startswith("--impl=")), "conv")
    pos = [a for a in argv if not a.startswith("--")]
    T = int(pos[0]) if pos else 64
    N = int(pos[1]) if len(pos) > 1 else 4096

    env_cfg = EnvConfig()
    ppo_cfg = PPOConfig()
    optimizer = make_optimizer(ppo_cfg)
    net = make_network(env_cfg, bf16=bf16, trunk_impl=impl)
    apply_fn = make_apply_fn(net)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 8)))
    opt_state = optimizer.init(params)
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    roll = Transition(
        obs=jax.random.bernoulli(ks[0], 0.3, (T, N, 4, 8, 8)).astype(
            jnp.int8),
        action=jax.random.randint(ks[1], (T, N), 0, 64),
        logp=-jnp.ones((T, N)) * 3.0,
        value=jnp.zeros((T, N)),
        reward=jnp.zeros((T, N)),
        done=jnp.zeros((T, N), bool),
        legal=jnp.ones((T, N, 64), bool))
    boot = jnp.zeros((N,))

    def full_update(roll):
        p2, _, metrics = ppo_update(params, opt_state, roll, boot,
                                    jax.random.PRNGKey(2), apply_fn,
                                    optimizer, ppo_cfg)
        return metrics["value_loss"]

    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_")
    capture(full_update, (roll,), trace_dir)
    print("trace dir:", trace_dir, flush=True)
    summarize(trace_dir)


if __name__ == "__main__":
    main()
