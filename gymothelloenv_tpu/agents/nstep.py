"""Vectorized n-step transition windows.

Reproduces DQNAgent's n-step buffer semantics (dqn.py:288-350, :469-473):
each pushed transition enters a per-stream FIFO; when the FIFO reaches n the
oldest element is emitted as an n-step transition
``(s_0, a_0, sum_k gamma^k r_k, s'_newest, done_newest)``; on a terminal
push the whole FIFO is flushed with shrinking windows (every remaining
element emits against the terminal next-state).

All streams (one per env x color) advance in lockstep with masks; per push
at most ``n`` emissions occur (the pop-on-full and the flush are mutually
exclusive: a terminal push flushes everything including itself).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NStepFifo:
    """Per-stream FIFO, arrays (n, N, ...); index 0 is oldest; ``count``
    (N,) valid entries."""
    board: jnp.ndarray        # int8 (n, N, B, B)
    turn: jnp.ndarray         # int8 (n, N)
    action: jnp.ndarray       # int32 (n, N)
    reward: jnp.ndarray       # float32 (n, N)
    next_board: jnp.ndarray   # int8 (n, N, B, B)
    next_turn: jnp.ndarray    # int8 (n, N)
    done: jnp.ndarray         # bool (n, N)
    count: jnp.ndarray        # int32 (N,)


def nstep_init(n: int, num: int, board_size: int) -> NStepFifo:
    return NStepFifo(
        board=jnp.zeros((n, num, board_size, board_size), jnp.int8),
        turn=jnp.zeros((n, num), jnp.int8),
        action=jnp.zeros((n, num), jnp.int32),
        reward=jnp.zeros((n, num), jnp.float32),
        next_board=jnp.zeros((n, num, board_size, board_size), jnp.int8),
        next_turn=jnp.zeros((n, num), jnp.int8),
        done=jnp.zeros((n, num), bool),
        count=jnp.zeros((num,), jnp.int32),
    )


@struct.dataclass
class Emitted:
    """n emission slots per push, masked by ``valid`` (n, N)."""
    board: jnp.ndarray
    turn: jnp.ndarray
    action: jnp.ndarray
    reward: jnp.ndarray
    next_board: jnp.ndarray
    next_turn: jnp.ndarray
    done: jnp.ndarray
    valid: jnp.ndarray


def _set_row(arr, idx, val):
    """arr[(idx, j), ...] = val[j] for per-stream row index idx (N,)."""
    n = arr.shape[0]
    onehot = (jnp.arange(n)[:, None] == idx[None, :])
    shape = onehot.shape + (1,) * (arr.ndim - 2)
    return jnp.where(onehot.reshape(shape), val[None], arr)


def nstep_push(fifo: NStepFifo, gamma: float,
               board, turn, action, reward, next_board, next_turn, done,
               do) -> tuple[NStepFifo, Emitted]:
    """Push one transition per stream (masked by ``do``); returns the
    updated FIFO and up to n emitted n-step transitions per stream."""
    n, N = fifo.turn.shape

    # Append at index `count` (count < n is an invariant: a full FIFO pops
    # immediately below, and flushes empty it).
    idx = fifo.count
    def app(a, v):
        new = _set_row(a, idx, v)
        return jnp.where(do.reshape((1, N) + (1,) * (a.ndim - 2)), new, a)
    fifo = fifo.replace(
        board=app(fifo.board, board), turn=app(fifo.turn, turn),
        action=app(fifo.action, action), reward=app(fifo.reward, reward),
        next_board=app(fifo.next_board, next_board),
        next_turn=app(fifo.next_turn, next_turn),
        done=app(fifo.done, done),
        count=jnp.where(do, fifo.count + 1, fifo.count))

    count = fifo.count                       # post-push length
    newest = jnp.maximum(count - 1, 0)
    flush = do & done                        # terminal push: emit everything
    pop_one = do & ~done & (count == n)      # FIFO full: emit the oldest

    # Emission slot k = window starting at FIFO index k.
    # pop_one only uses k = 0; flush uses k = 0..count-1.
    valid = jnp.where(flush[None, :],
                      jnp.arange(n)[:, None] < count[None, :],
                      (jnp.arange(n)[:, None] == 0) & pop_one[None, :])

    # Discounted suffix sums: R_k = sum_{j>=k, j<count} gamma^{j-k} r_j.
    in_window = jnp.arange(n)[:, None] < count[None, :]
    r = jnp.where(in_window, fifo.reward, 0.0)
    discounts = gamma ** jnp.arange(n).astype(jnp.float32)

    def suffix(k):
        j = jnp.arange(n)
        w = jnp.where(j >= k, discounts[jnp.maximum(j - k, 0)], 0.0)
        return (w[:, None] * r).sum(axis=0)
    R = jnp.stack([suffix(k) for k in range(n)])      # (n, N)

    # One-hot pick of FIFO row `newest` per game (n is tiny, so the
    # masked reduce is ~free; take_along_axis gathers are not — see
    # ops/gather.py).
    sel = jnp.arange(n)[:, None] == newest[None, :].astype(jnp.int32)
    newest_next_board = jnp.where(
        sel[:, :, None, None], fifo.next_board, 0).sum(0).astype(
        fifo.next_board.dtype)
    newest_next_turn = jnp.where(sel, fifo.next_turn, 0).sum(0).astype(
        fifo.next_turn.dtype)
    newest_done = jnp.where(sel, fifo.done, False).any(axis=0)

    emitted = Emitted(
        board=fifo.board, turn=fifo.turn, action=fifo.action, reward=R,
        next_board=jnp.broadcast_to(newest_next_board[None],
                                    fifo.next_board.shape),
        next_turn=jnp.broadcast_to(newest_next_turn[None],
                                   fifo.next_turn.shape),
        done=jnp.broadcast_to(newest_done[None], fifo.done.shape),
        valid=valid)

    # Post-emission FIFO state: flush empties (count=0); pop_one rolls the
    # arrays left by one (dropping the oldest).
    def maybe_roll(a):
        rolled = jnp.roll(a, -1, axis=0)
        mask = pop_one.reshape((1, N) + (1,) * (a.ndim - 2))
        return jnp.where(mask, rolled, a)

    fifo = fifo.replace(
        board=maybe_roll(fifo.board), turn=maybe_roll(fifo.turn),
        action=maybe_roll(fifo.action), reward=maybe_roll(fifo.reward),
        next_board=maybe_roll(fifo.next_board),
        next_turn=maybe_roll(fifo.next_turn), done=maybe_roll(fifo.done),
        count=jnp.where(flush, 0,
                        jnp.where(pop_one, n - 1, fifo.count)))
    return fifo, emitted
