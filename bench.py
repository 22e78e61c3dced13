"""Headline benchmark: batched 8x8 Othello env stepping throughput.

Prints ONE JSON line:
    {"metric": "env_steps_per_sec_chip", "value": N, "unit": "steps/s",
     "vs_baseline": N / 1e7}

Protocol (BASELINE.json configs[1]): 8x8 board, batch 4096, random legal
actions, auto-reset, everything inside one jitted ``lax.scan`` so the chip
never waits on the host.  Baseline target: 10M env-steps/s per v5e chip.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import numpy as np

from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.envs import vec_reset, vec_step
from gymothelloenv_tpu.policies.scripted import random_actions_batched

BATCH = 4096
CHUNK = 512          # env-steps per device program
WARMUP_CHUNKS = 2
MEASURE_CHUNKS = 8


@functools.partial(jax.jit, static_argnames=("cfg", "num_steps"))
def rollout_chunk(state, key, cfg: EnvConfig, num_steps: int):
    def body(carry, _):
        state, key = carry
        key, k = jax.random.split(key)
        actions = random_actions_batched(k, state.core.legal)
        res = vec_step(state, actions, cfg)
        return (res.state, key), res.done.sum()

    (state, key), dones = jax.lax.scan(body, (state, key), None,
                                       length=num_steps)
    return state, key, dones.sum()


def main():
    cfg = EnvConfig()
    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state = vec_reset(k0, cfg, BATCH)
    # NOTE: synchronization is via host fetches, not block_until_ready —
    # the axon TPU-tunnel backend's block_until_ready does not actually
    # block.  The tiny fetch below absorbs the tunnel's one-time init
    # stall BEFORE any large program is queued: queuing compute first has
    # been observed to wedge the tunnel handshake indefinitely.
    np.asarray(state.core.board[0])
    for _ in range(WARMUP_CHUNKS):
        key, k = jax.random.split(key)
        state, _, episodes = rollout_chunk(state, k, cfg, CHUNK)
        int(episodes)

    t0 = time.perf_counter()
    total_episodes = 0
    for _ in range(MEASURE_CHUNKS):
        key, k = jax.random.split(key)
        state, _, episodes = rollout_chunk(state, k, cfg, CHUNK)
        total_episodes += int(episodes)
    dt = time.perf_counter() - t0

    steps = BATCH * CHUNK * MEASURE_CHUNKS
    steps_per_sec = steps / dt
    print(json.dumps({
        "metric": "env_steps_per_sec_chip",
        "value": round(steps_per_sec),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 1e7, 4),
    }))


if __name__ == "__main__":
    main()
