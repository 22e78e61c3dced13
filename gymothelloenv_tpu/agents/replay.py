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

Storage layout: the whole transition (s, a, r, s', done) lives BYTE-PACKED
in one uint8 ``(capacity+1, row_bytes)`` array (``ops.gather.make_row_codec``)
so an insert is ONE scatter and a sample fetch ONE gather — on TPU each
64K-row scatter/gather costs ~0.5 ms nearly independent of row width
(scripts/trace_update.py), and the per-field layout paid that 7-8x per
call (scripts/bench_replay.py A/Bs the two).  ``priority`` stays a separate
float32 column: PER updates it independently and sampling prefix-sums it.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.ops.gather import make_row_codec


@dataclasses.dataclass(frozen=True)
class ReplayConfig:
    capacity: int = 1_000_000     # dqn.py:176 replay_memory_size
    board_size: int = 8
    prioritized: bool = False
    priority_e: float = 0.01      # dqn.py:31-32
    priority_a: float = 0.6


@struct.dataclass
class Replay:
    """Ring buffer of (s, a, r, s', done), byte-packed one row per
    transition; index ``capacity`` is a scratch row for masked (invalid)
    writes."""
    data: jnp.ndarray         # uint8 (C+1, row_bytes) packed transition
    priority: jnp.ndarray     # float32 (C+1,) (unused when uniform)
    max_priority: jnp.ndarray  # float32 () running max (dqn.py:36, :66-69)
    write_pos: jnp.ndarray    # int32 () next slot
    size: jnp.ndarray         # int32 () filled entries (<= capacity)


@functools.lru_cache(maxsize=None)
def _codec(board_size: int):
    """(pack, unpack, row_bytes) for one transition row."""
    B = board_size
    template = {
        "board": jnp.zeros((0, B, B), jnp.int8),
        "turn": jnp.zeros((0,), jnp.int8),
        "action": jnp.zeros((0,), jnp.int32),
        "reward": jnp.zeros((0,), jnp.float32),
        "next_board": jnp.zeros((0, B, B), jnp.int8),
        "next_turn": jnp.zeros((0,), jnp.int8),
        "done": jnp.zeros((0,), bool),
    }
    return make_row_codec(template)


def replay_init(cfg: ReplayConfig) -> Replay:
    C = cfg.capacity
    _, _, row_bytes = _codec(cfg.board_size)
    return Replay(
        data=jnp.zeros((C + 1, row_bytes), jnp.uint8),
        priority=jnp.zeros((C + 1,), jnp.float32),
        max_priority=jnp.float32(1.0),
        write_pos=jnp.int32(0),
        size=jnp.int32(0),
    )


def replay_insert(rb: Replay, cfg: ReplayConfig, board, turn, action, reward,
                  next_board, next_turn, done, valid) -> Replay:
    """Masked batch insert of K transitions.  Valid entries take consecutive
    ring slots; invalid ones are routed to the scratch row.  The whole
    transition writes as ONE scatter of packed byte rows."""
    C = cfg.capacity
    offsets = jnp.cumsum(valid.astype(jnp.int32)) - 1
    slots = (rb.write_pos + offsets) % C
    idx = jnp.where(valid, slots, C)

    pack, _, _ = _codec(cfg.board_size)
    rows = pack({"board": board, "turn": turn,
                 "action": action.astype(jnp.int32),
                 "reward": reward.astype(jnp.float32),
                 "next_board": next_board, "next_turn": next_turn,
                 "done": done})

    num = valid.sum(dtype=jnp.int32)
    return rb.replace(
        data=rb.data.at[idx].set(rows),
        # Invalid entries all land on the scratch row C, which sampling
        # and priority updates never touch — writing max_priority there
        # too saves a per-insert row gather.
        priority=rb.priority.at[idx].set(
            jnp.broadcast_to(rb.max_priority, idx.shape)),
        write_pos=(rb.write_pos + num) % C,
        size=jnp.minimum(rb.size + num, C),
    )


_PER_BLOCK = 1024


def _row_cumsum_blocks(grid: jnp.ndarray) -> jnp.ndarray:
    """Inclusive row-wise prefix sum of ``(R, 1024)`` on the MXU.

    XLA lowers ``jnp.cumsum(axis=-1)`` over 1024-wide rows through an
    O(n*window) reduce-window — on the 1M-slot PER grid that single HLO
    (fusion.936, f32[977,8,128] window 1x1x128) cost 0.235 ms per
    update = 30 ms/chunk, the LARGEST op of the whole Rainbow train
    chunk (round-5 attribution, data/logs/queue/
    51_trace_rainbow_attrib.log).  A prefix sum is a triangular matmul:
    splitting each row into 8 lane-groups of 128, one batched
    (128, 128) upper-triangular matmul computes the within-group
    prefixes in MXU time and an 8-wide cumsum supplies the group
    offsets.  Float reassociation differs from the flat cumsum
    (hierarchical vs sequential); the sampling distribution is
    unchanged and indices are identical whenever priorities are exactly
    representable (gated by tests/test_replay.py)."""
    R, B = grid.shape
    assert B == _PER_BLOCK == 8 * 128, B
    sub = grid.reshape(R, 8, 128)
    tri = jnp.triu(jnp.ones((128, 128), grid.dtype))
    lane_cum = sub @ tri
    sub_tot = lane_cum[..., -1]
    # Exclusive 8-wide prefix as a matmul too: the jnp.cumsum version
    # still lowered as a 5.2 ms/chunk reduce-window (58_rainbow_after
    # retrace).
    sub_off = sub_tot @ jnp.triu(jnp.ones((8, 8), grid.dtype), k=1)
    return (lane_cum + sub_off[..., None]).reshape(R, B)


def replay_sample_idx(rb: Replay, cfg: ReplayConfig, key: jax.Array,
                      batch: int) -> jnp.ndarray:
    """Sample ``batch`` indices: uniform, or stratified proportional
    (Memory.sample, dqn.py:49-63).

    The proportional path uses a two-level (block) prefix sum and a
    vectorized two-level search instead of a flat ``cumsum`` +
    ``searchsorted``: XLA lowers the flat 1M-element cumsum through
    reduce-window (~2.9 ms) and the searchsorted through a vmapped
    while-loop of gathers (~0.6 ms) — together over half of a Rainbow
    update's device time (scripts/trace_rainbow_chunk.py).  The block
    form is two small cumsums plus compare-and-count reductions, same
    sampling distribution (prefix sums differ only by float
    reassociation; identical when priorities are exactly representable).
    """
    if not cfg.prioritized:
        return jax.random.randint(key, (batch,), 0, rb.size)
    C = cfg.capacity
    nrows = -(-C // _PER_BLOCK)
    prio = jnp.where(jnp.arange(nrows * _PER_BLOCK) < rb.size,
                     jnp.pad(rb.priority[:C],
                             (0, nrows * _PER_BLOCK - C)), 0.0)
    grid = prio.reshape(nrows, _PER_BLOCK)
    row_cum = _row_cumsum_blocks(grid)            # (nrows, BLOCK)
    block_tot = row_cum[:, -1]                    # (nrows,)
    block_cum = jnp.cumsum(block_tot)             # inclusive (nrows,)
    block_off = block_cum - block_tot             # exclusive offsets
    total = block_cum[-1]

    segment = total / batch
    u = jax.random.uniform(key, (batch,))
    targets = (jnp.arange(batch) + u) * segment

    # searchsorted(a, t, 'left') == count(a < t), vectorized.
    b_idx = jnp.clip((block_cum[None, :] < targets[:, None]).sum(-1),
                     0, nrows - 1)
    rows = row_cum[b_idx]                         # (batch, BLOCK) gather
    t_in = targets - block_off[b_idx]
    within = (rows < t_in[:, None]).sum(-1)
    idx = b_idx * _PER_BLOCK + within
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


def unpack_rows(rows: jnp.ndarray, board_size: int):
    """Decode packed byte rows (K, row_bytes) -> transition arrays.
    Used by the per-shard replay path, whose psum-assembled batch arrives
    as raw rows rather than ring indices (parallel/replay_shards.py)."""
    _, unpack, _ = _codec(board_size)
    d = unpack(rows)
    return (d["board"], d["turn"], d["action"], d["reward"],
            d["next_board"], d["next_turn"], d["done"])


def replay_gather(rb: Replay, idx: jnp.ndarray):
    """Fetch a batch of raw transitions (boards/turn form) — ONE gather of
    packed rows, then free slice/bitcast unpacks."""
    board_size = _board_size_of(rb)
    _, unpack, _ = _codec(board_size)
    d = unpack(rb.data[idx])
    return (d["board"], d["turn"], d["action"], d["reward"],
            d["next_board"], d["next_turn"], d["done"])


def _board_size_of(rb: Replay) -> int:
    """Recover the (static) board size from the packed row width:
    row_bytes = 2*B^2 + 11."""
    row_bytes = rb.data.shape[1]
    b2 = (row_bytes - 11) // 2
    board_size = int(round(b2 ** 0.5))
    assert 2 * board_size * board_size + 11 == row_bytes, row_bytes
    return board_size
