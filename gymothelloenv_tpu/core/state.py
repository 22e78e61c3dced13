"""Functional Othello game state and transition, reproducing the reference
semantics of ``OthelloBaseEnv`` (/root/reference/othello.py:217-501) as pure
JAX functions over fixed-shape arrays.

Conventions (identical to the reference):
  * ``board`` is ``int8 (B, B)`` with +1 = white disk, -1 = black disk,
    0 = empty (othello.py:10-12).
  * ``turn`` is the player to move: -1 black, +1 white.  Black moves first
    (othello.py:239).
  * Observations are canonical: ``board * turn`` so the current player's
    disks are +1 (othello.py:363-369).
  * Actions are flat indices ``row * B + col`` (othello.py:245).

All functions are unbatched over the game; batch with ``jax.vmap`` and wrap in
``jax.jit``.  Every shape is static and there is no data-dependent Python
control flow, so thousands of games step in lockstep on a TPU chip.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.core import bitops

BLACK_DISK = -1
NO_DISK = 0
WHITE_DISK = 1


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Static environment configuration (hashable; safe as a jit constant).

    Mirrors the ``OthelloBaseEnv.__init__`` flags (othello.py:222-236).
    """
    board_size: int = 8
    sudden_death_on_invalid_move: bool = True
    num_disk_as_reward: bool = False

    @property
    def num_actions(self) -> int:
        return self.board_size * self.board_size


@struct.dataclass
class OthelloState:
    """Single-game state pytree (batch by vmapping the transition fns)."""
    board: jnp.ndarray       # int8 (B, B); +1 white, -1 black, 0 empty
    turn: jnp.ndarray        # int8 (); player to move (last mover if done)
    legal: jnp.ndarray       # bool (B*B,); legal actions for `turn`
    terminated: jnp.ndarray  # bool ()
    winner: jnp.ndarray      # int8 (); +1 white, -1 black, 0 draw/ongoing


@struct.dataclass
class StepResult:
    state: OthelloState
    obs: jnp.ndarray         # int8 (B, B); canonical board (board * turn)
    reward: jnp.ndarray      # float32 (); mover-perspective terminal reward
    done: jnp.ndarray        # bool ()


def initial_board(cfg: EnvConfig) -> jnp.ndarray:
    """Standard central 4-disk setup (othello.py:256-263)."""
    B = cfg.board_size
    c = B // 2
    board = jnp.zeros((B, B), jnp.int8)
    board = board.at[c - 1, c - 1].set(WHITE_DISK)
    board = board.at[c, c].set(WHITE_DISK)
    board = board.at[c, c - 1].set(BLACK_DISK)
    board = board.at[c - 1, c].set(BLACK_DISK)
    return board


def disk_planes(board: jnp.ndarray, turn: jnp.ndarray):
    """Split a signed board into (mine, opp) boolean planes for ``turn``."""
    signed = board * turn.astype(board.dtype)
    return signed == 1, signed == -1


def legal_actions(board: jnp.ndarray, turn: jnp.ndarray) -> jnp.ndarray:
    """Flat bool (B*B,) legal-move mask for ``turn`` (othello.py:313-343)."""
    mine, opp = disk_planes(board, turn)
    return bitops.legal_mask(mine, opp).reshape(-1)


def reset(cfg: EnvConfig) -> OthelloState:
    """Fresh game: black to move (othello.py:265-271)."""
    board = initial_board(cfg)
    turn = jnp.int8(BLACK_DISK)
    return OthelloState(
        board=board,
        turn=turn,
        legal=legal_actions(board, turn),
        terminated=jnp.bool_(False),
        winner=jnp.int8(NO_DISK),
    )


def observe(state: OthelloState) -> jnp.ndarray:
    """Canonical observation: current player's disks are +1
    (othello.py:363-369)."""
    return state.board * state.turn


def observe_with_legal(state: OthelloState) -> jnp.ndarray:
    """2-plane observation: canonical board + legal-move plane, matching
    ``possible_actions_in_obs=True`` (othello.py:370-376).  Returns
    int8 (2, B, B)."""
    B = state.board.shape[-1]
    return jnp.stack([
        observe(state),
        state.legal.reshape(B, B).astype(jnp.int8),
    ])


def count_disks(board: jnp.ndarray):
    """(white_count, black_count), int32 (othello.py:468-471)."""
    white = (board == WHITE_DISK).sum().astype(jnp.int32)
    black = (board == BLACK_DISK).sum().astype(jnp.int32)
    return white, black


def _step_bitboard(state: OthelloState, action: jnp.ndarray,
                   cfg: EnvConfig) -> StepResult:
    """8x8 fast path of :func:`step` on packed uint32 bitboards — identical
    semantics, ~8x less data movement.  The rules themselves live in
    ``bitboard.bit_step`` (single source of truth; the bit-native vector
    env keeps that representation across whole rollouts)."""
    from gymothelloenv_tpu.core import bitboard as bb

    bits = bb.from_planes(state.board, state.turn, state.legal,
                          state.terminated, state.winner)
    res = bb.bit_step(
        bits, action,
        sudden_death_on_invalid_move=cfg.sudden_death_on_invalid_move,
        num_disk_as_reward=cfg.num_disk_as_reward)
    board = bb.to_board(res.state)
    new_state = OthelloState(
        board=board,
        turn=res.state.turn,
        legal=bb.unpack2(res.state.legal).reshape(
            state.legal.shape),
        terminated=res.state.terminated,
        winner=res.state.winner,
    )
    return StepResult(state=new_state, obs=board * res.state.turn,
                      reward=res.reward, done=res.done)


def step(state: OthelloState, action: jnp.ndarray,
         cfg: EnvConfig) -> StepResult:
    """One ply, bit-exact with ``OthelloBaseEnv.step`` (othello.py:412-462).

    ``action`` is a flat int index.  The caller must not step a terminated
    game (the reference raises; here behaviour is undefined — use
    ``step_autoreset`` or mask externally).

    Semantics reproduced:
      1. Illegal action: board unchanged; "sudden death" terminal loss for
         the mover when ``sudden_death_on_invalid_move`` (othello.py:417-428,
         :475-485), otherwise the mover just forfeits the ply.
      2. Legal action: place disk, flip 8-direction runs (othello.py:391-410).
      3. Termination: sudden death | board full | neither player can move
         (othello.py:424-442).
      4. Pass: if the opponent has no moves but the mover does, the turn
         bounces back to the mover (othello.py:436-441).
      5. Terminal reward from the mover's perspective: ``winner * mover``, or
         the disk-count variants when ``num_disk_as_reward``
         (othello.py:444-461).  Non-terminal reward is 0.
    """
    if cfg.board_size == 8:
        return _step_bitboard(state, action, cfg)
    B = cfg.board_size
    mover = state.turn
    board = state.board

    onehot = (jnp.arange(B * B) == action).reshape(B, B)
    mine, opp = disk_planes(board, mover)
    valid = state.legal[action]

    new_mine, new_opp = bitops.apply_move(onehot, mine, opp)
    mine = jnp.where(valid, new_mine, mine)
    opp = jnp.where(valid, new_opp, opp)
    board = jnp.where(
        mine, mover, jnp.where(opp, -mover, jnp.int8(0))).astype(jnp.int8)

    board_full = (board != NO_DISK).all()
    sudden = (~valid) if cfg.sudden_death_on_invalid_move else jnp.bool_(False)
    done_now = sudden | board_full

    # Turn toggling with the pass rule (othello.py:436-442).
    legal_opp = legal_actions(board, -mover)
    legal_same = legal_actions(board, mover)
    opp_has = legal_opp.any()
    same_has = legal_same.any()
    stuck = ~opp_has & ~same_has
    terminated = done_now | stuck

    next_turn = jnp.where(terminated, mover,
                          jnp.where(opp_has, -mover, mover)).astype(jnp.int8)
    next_legal = jnp.where(
        terminated,
        jnp.zeros_like(legal_opp),
        jnp.where(opp_has, legal_opp, legal_same),
    )

    # Winner (othello.py:473-501).
    white_cnt, black_cnt = count_disks(board)
    count_winner = jnp.sign(white_cnt - black_cnt).astype(jnp.int8)
    winner = jnp.where(
        terminated,
        jnp.where(sudden, (-mover).astype(jnp.int8), count_winner),
        jnp.int8(NO_DISK),
    )

    # Mover-perspective terminal reward (othello.py:444-461).
    if cfg.num_disk_as_reward:
        mover_cnt = jnp.where(mover == WHITE_DISK, white_cnt, black_cnt)
        opp_cnt = jnp.where(mover == WHITE_DISK, black_cnt, white_cnt)
        disk_reward = (mover_cnt - opp_cnt).astype(jnp.float32)
        disk_reward = jnp.where(opp_cnt == 0, jnp.float32(B * B), disk_reward)
        reward = jnp.where(sudden, jnp.float32(-(B * B)), disk_reward)
    else:
        reward = (winner * mover).astype(jnp.float32)
    reward = jnp.where(terminated, reward, jnp.float32(0.0))

    new_state = OthelloState(
        board=board,
        turn=next_turn,
        legal=next_legal,
        terminated=terminated,
        winner=winner,
    )
    return StepResult(
        state=new_state,
        obs=board * next_turn,
        reward=reward,
        done=terminated,
    )


def step_autoreset(state: OthelloState, action: jnp.ndarray,
                   cfg: EnvConfig) -> StepResult:
    """Step; if the game ends, the returned *state* is a fresh game while
    ``obs``/``reward``/``done`` describe the terminal transition.  Games that
    are already terminated on entry are also reset (action ignored)."""
    fresh = reset(cfg)

    def do_step(_):
        return step(state, action, cfg)

    def do_reset(_):
        return StepResult(state=fresh, obs=observe(fresh),
                          reward=jnp.float32(0.0), done=jnp.bool_(False))

    result = jax.lax.cond(state.terminated, do_reset, do_step, None)
    next_state = jax.tree.map(
        lambda f, s: jnp.where(result.done, f, s), fresh, result.state)
    return StepResult(state=next_state, obs=result.obs,
                      reward=result.reward, done=result.done)
