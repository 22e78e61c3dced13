"""Decompose the replay insert cost: pack, data scatter, priority scatter,
cumsum/slot math, at two capacities — pins down whether the scatter cost
scales with buffer capacity (tile-padding copies) or updates.

Usage: python scripts/bench_replay_parts.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.agents.replay import _codec
from gymothelloenv_tpu.utils import tpu

REPS = 64
K = 2048


def timed_scan(fn, carry0):
    """Time REPS sequential applications of carry = fn(carry, i)."""
    @jax.jit
    def many(carry):
        def body(c, i):
            return fn(c, i), None
        c, _ = jax.lax.scan(body, carry,
                            jnp.arange(REPS, dtype=jnp.int32))
        return c
    out = many(carry0)
    jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32).item()
    t0 = time.perf_counter()
    out = many(carry0)
    jax.tree.leaves(out)[0].ravel()[0].astype(jnp.float32).item()
    return (time.perf_counter() - t0) / REPS


def main():
    tpu.warmup()
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    pack, unpack, row_bytes = _codec(8)
    board = jax.random.randint(ks[0], (K, 8, 8), -1, 2).astype(jnp.int8)
    tree = {"board": board, "turn": jnp.ones((K,), jnp.int8),
            "action": jax.random.randint(ks[1], (K,), 0, 64),
            "reward": jax.random.normal(ks[2], (K,)),
            "next_board": board, "next_turn": jnp.ones((K,), jnp.int8),
            "done": jnp.zeros((K,), bool)}
    rows = pack(tree)
    valid = jax.random.bernoulli(ks[4], 0.9, (K,))
    out = {"row_bytes": row_bytes}

    # pack alone (jitter the reward so it can't be CSE'd)
    out["pack_ms"] = round(timed_scan(
        lambda c, i: c + pack(dict(tree, reward=tree["reward"]
                                   + i)).astype(jnp.float32)[0, :4].sum(),
        jnp.float32(0)) * 1e3, 3)

    for C in (1_000_000, 100_000):
        data = jnp.zeros((C + 1, row_bytes), jnp.uint8)
        prio = jnp.zeros((C + 1,), jnp.float32)
        idx0 = jax.random.randint(ks[5], (K,), 0, C)

        out[f"scatter_data_ms_C{C}"] = round(timed_scan(
            lambda d, i: d.at[(idx0 + i) % C].set(rows), data) * 1e3, 3)
        out[f"scatter_prio_ms_C{C}"] = round(timed_scan(
            lambda p, i: p.at[(idx0 + i) % C].set(
                jnp.float32(1.0) + i), prio) * 1e3, 3)
        # scatter with the slot math of replay_insert (cumsum + where)
        def full_slots(carry, i):
            d, wp = carry
            offsets = jnp.cumsum(valid.astype(jnp.int32)) - 1
            slots = (wp + offsets) % C
            idx = jnp.where(valid, slots, C)
            d = d.at[idx].set(rows)
            return (d, wp + valid.sum(dtype=jnp.int32))
        out[f"scatter_slotmath_ms_C{C}"] = round(timed_scan(
            full_slots, (data, jnp.int32(0))) * 1e3, 3)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
