"""Observation featurizers, reproducing the reference's ``util.make_state`` /
``undo_state`` (/root/reference/util.py:48-85) and the 3-channel variant used
by ``run_2agent.py`` as pure JAX functions.
"""

from __future__ import annotations

import jax.numpy as jnp

from gymothelloenv_tpu.core.state import OthelloState


def make_state(state: OthelloState,
               replicate_single_move_quirk: bool = True) -> jnp.ndarray:
    """4-plane network input ``(4, B, B)`` float32:
    [black disks, white disks, turn plane, legal-move plane]
    (util.py:48-74).

    The reference only fills the legal-move plane when there are >= 2 legal
    moves (``len(idx2) > 1``, util.py:55) — with exactly one legal move the
    plane is left all-zero.  ``replicate_single_move_quirk=True`` (default)
    reproduces that behaviour bit-exactly; pass False for the fixed variant.
    """
    B = state.board.shape[-1]
    black = (state.board == -1).astype(jnp.float32)
    white = (state.board == 1).astype(jnp.float32)
    turn = jnp.full((B, B), (state.turn + 1) // 2, jnp.float32)
    legal = state.legal.reshape(B, B).astype(jnp.float32)
    if replicate_single_move_quirk:
        legal = legal * (state.legal.sum() >= 2)
    return jnp.stack([black, white, turn, legal])


def undo_state(planes: jnp.ndarray, player_turn: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``make_state``: canonical observation ``board * turn``
    (util.py:77-85).  ``planes`` is ``(>=3, B, B)``."""
    black_minus_white = planes[0] - planes[1]
    return jnp.where(player_turn == -1, black_minus_white, -black_minus_white)


def make_state_3ch(state: OthelloState) -> jnp.ndarray:
    """3-plane variant ``(3, B, B)``: [black, white, turn] — the featurizer
    defined inline by ``run_2agent.py:29-46`` (no legal-move plane)."""
    B = state.board.shape[-1]
    black = (state.board == -1).astype(jnp.float32)
    white = (state.board == 1).astype(jnp.float32)
    turn = jnp.full((B, B), (state.turn + 1) // 2, jnp.float32)
    return jnp.stack([black, white, turn])
