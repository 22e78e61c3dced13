"""On-device experience replay: uniform ring buffer + proportional
prioritized replay.

The prioritized variant reproduces the reference's SumTree semantics
(SumTree.py + dqn.py ``Memory``): proportional sampling with stratified
segments (dqn.py:49-63), priority ``(|err| + e) ** a`` (dqn.py:38-39), new
samples inserted at the running max priority (dqn.py:311, :66-69).  Instead
of a pointer-chasing binary tree, sampling is a ``searchsorted`` over the
priority prefix-sum — O(C) vectorized work on the VPU instead of O(log C)
serial hops, and batch inserts/updates are plain scatters.

Observations are stored as int8 boards + turn (not float planes) — 65 bytes
per state instead of 768/1024 — and featurized on sample.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.ops.gather import gather_rows


@dataclasses.dataclass(frozen=True)
class ReplayConfig:
    capacity: int = 1_000_000     # dqn.py:176 replay_memory_size
    board_size: int = 8
    prioritized: bool = False
    priority_e: float = 0.01      # dqn.py:31-32
    priority_a: float = 0.6


@struct.dataclass
class Replay:
    """Ring buffer of (s, a, r, s', done).  Boards are raw int8 + turn;
    index ``capacity`` is a scratch row for masked (invalid) writes."""
    board: jnp.ndarray        # int8 (C+1, B, B)
    turn: jnp.ndarray         # int8 (C+1,)
    action: jnp.ndarray       # int32 (C+1,)
    reward: jnp.ndarray       # float32 (C+1,)
    next_board: jnp.ndarray   # int8 (C+1, B, B)
    next_turn: jnp.ndarray    # int8 (C+1,)
    done: jnp.ndarray         # bool (C+1,)
    priority: jnp.ndarray     # float32 (C+1,) (unused when uniform)
    max_priority: jnp.ndarray  # float32 () running max (dqn.py:36, :66-69)
    write_pos: jnp.ndarray    # int32 () next slot
    size: jnp.ndarray         # int32 () filled entries (<= capacity)


def replay_init(cfg: ReplayConfig) -> Replay:
    C, B = cfg.capacity, cfg.board_size
    return Replay(
        board=jnp.zeros((C + 1, B, B), jnp.int8),
        turn=jnp.zeros((C + 1,), jnp.int8),
        action=jnp.zeros((C + 1,), jnp.int32),
        reward=jnp.zeros((C + 1,), jnp.float32),
        next_board=jnp.zeros((C + 1, B, B), jnp.int8),
        next_turn=jnp.zeros((C + 1,), jnp.int8),
        done=jnp.zeros((C + 1,), bool),
        priority=jnp.zeros((C + 1,), jnp.float32),
        max_priority=jnp.float32(1.0),
        write_pos=jnp.int32(0),
        size=jnp.int32(0),
    )


def replay_insert(rb: Replay, cfg: ReplayConfig, board, turn, action, reward,
                  next_board, next_turn, done, valid) -> Replay:
    """Masked batch insert of K transitions.  Valid entries take consecutive
    ring slots; invalid ones are routed to the scratch row."""
    C = cfg.capacity
    K = action.shape[0]
    offsets = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slots = (rb.write_pos + offsets) % C
    idx = jnp.where(valid, slots, C)

    num = valid.sum(dtype=jnp.int32)
    return rb.replace(
        board=rb.board.at[idx].set(board),
        turn=rb.turn.at[idx].set(turn),
        action=rb.action.at[idx].set(action),
        reward=rb.reward.at[idx].set(reward),
        next_board=rb.next_board.at[idx].set(next_board),
        next_turn=rb.next_turn.at[idx].set(next_turn),
        done=rb.done.at[idx].set(done),
        priority=rb.priority.at[idx].set(
            jnp.where(valid, rb.max_priority, rb.priority[idx])),
        write_pos=(rb.write_pos + num) % C,
        size=jnp.minimum(rb.size + num, C),
    )


def replay_sample_idx(rb: Replay, cfg: ReplayConfig, key: jax.Array,
                      batch: int) -> jnp.ndarray:
    """Sample ``batch`` indices: uniform, or stratified proportional
    (Memory.sample, dqn.py:49-63)."""
    if not cfg.prioritized:
        return jax.random.randint(key, (batch,), 0, rb.size)
    prio = jnp.where(jnp.arange(cfg.capacity) < rb.size,
                     rb.priority[:cfg.capacity], 0.0)
    cum = jnp.cumsum(prio)
    total = cum[-1]
    segment = total / batch
    u = jax.random.uniform(key, (batch,))
    targets = (jnp.arange(batch) + u) * segment
    idx = jnp.searchsorted(cum, targets, side="left")
    return jnp.clip(idx, 0, jnp.maximum(rb.size - 1, 0)).astype(jnp.int32)


def replay_update_priorities(rb: Replay, cfg: ReplayConfig,
                             idx: jnp.ndarray,
                             errors: jnp.ndarray) -> Replay:
    """Memory.update (dqn.py:65-69): p = (|err|+e)^a; track running max."""
    p = (jnp.abs(errors) + cfg.priority_e) ** cfg.priority_a
    return rb.replace(
        priority=rb.priority.at[idx].set(p),
        max_priority=jnp.maximum(rb.max_priority, p.max()),
    )


def replay_gather(rb: Replay, idx: jnp.ndarray):
    """Fetch a batch of raw transitions (boards/turn form)."""
    return (gather_rows(rb.board, idx), rb.turn[idx], rb.action[idx],
            rb.reward[idx], gather_rows(rb.next_board, idx),
            rb.next_turn[idx], rb.done[idx])
