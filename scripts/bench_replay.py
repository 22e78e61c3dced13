"""Micro-bench the on-device replay at DQN-throughput-mode sizes: K-row
masked inserts and batch sampling against a 1M-capacity buffer, timed as a
scan of 64 sequential calls in ONE dispatch (the per-ply cadence of
train_chunk).

Usage: python scripts/bench_replay.py [K] [batch]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.agents.replay import (ReplayConfig,
                                             replay_gather, replay_init,
                                             replay_insert,
                                             replay_sample_idx)
from gymothelloenv_tpu.utils import tpu

REPS = 64


def main():
    tpu.warmup()
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    cfg = ReplayConfig(capacity=1_000_000, prioritized=True)
    rb = replay_init(cfg)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    board = jax.random.randint(ks[0], (K, 8, 8), -1, 2).astype(jnp.int8)
    turn = jnp.ones((K,), jnp.int8)
    action = jax.random.randint(ks[1], (K,), 0, 64)
    reward = jax.random.normal(ks[2], (K,))
    done = jax.random.bernoulli(ks[3], 0.03, (K,))
    valid = jax.random.bernoulli(ks[4], 0.9, (K,))

    @jax.jit
    def insert_many(rb, reward):
        def body(rb, i):
            rb = replay_insert(rb, cfg, board, turn,
                               action, reward + i, board, turn, done,
                               valid)
            return rb, None
        rb, _ = jax.lax.scan(body, rb,
                             jnp.arange(REPS, dtype=jnp.float32))
        return rb

    rb2 = insert_many(rb, reward)
    int(rb2.size)  # sync
    t0 = time.perf_counter()
    rb2 = insert_many(rb2, reward + 1)
    int(rb2.size)
    dt_insert = (time.perf_counter() - t0) / REPS

    @jax.jit
    def sample_many(rb, key):
        def body(acc, k):
            idx = replay_sample_idx(rb, cfg, k, batch)
            out = replay_gather(rb, idx)
            s = sum(jnp.sum(o.astype(jnp.float32)) for o in out)
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0),
                              jax.random.split(key, REPS))
        return acc

    float(sample_many(rb2, ks[5]))
    t0 = time.perf_counter()
    float(sample_many(rb2, ks[6]))
    dt_sample = (time.perf_counter() - t0) / REPS

    print(json.dumps({
        "K": K, "batch": batch,
        "insert_ms": round(dt_insert * 1e3, 3),
        "sample_ms": round(dt_sample * 1e3, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
