"""Representation-generic batched engine ops for the rollout collectors.

The collectors (train/self_play.py, train/teacher_student.py,
train/dqn_trainer.py) talk to the rules engine through this small batched
interface so the 8x8 path can keep game state packed as uint32 bitboard
word pairs across a whole rollout — no plane pack/unpack per ply — while
other board sizes use the plane kernel.  ``get_engine(cfg)`` selects the
representation; both engines implement identical reference semantics
(othello.py:217-501), cross-validated by tests/test_engine_adapter.py.

Every method is batched over a leading ``N`` games axis and fully
jit/scan-compatible (static shapes, no data-dependent Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.core import bitboard as bb
from gymothelloenv_tpu.core import bitops
from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.featurize import make_state
from gymothelloenv_tpu.core.state import EnvConfig, OthelloState
from gymothelloenv_tpu.policies.scripted import greedy_action, random_action


def outcome_for_board(board: jnp.ndarray, pcolor: jnp.ndarray,
                      cfg: EnvConfig) -> jnp.ndarray:
    """Terminal outcome of a finished game from the protagonist's
    perspective, matching the mover-perspective rewards the reference worker
    forwards/negates (ppo_run_self_play.py:303-306, :346-348;
    othello.py:444-461).  Sudden death cannot occur (policies only emit
    legal moves)."""
    mine = (board == pcolor[..., None, None].astype(board.dtype)).sum(
        axis=(-2, -1)).astype(jnp.float32)
    theirs = (board == (-pcolor)[..., None, None].astype(board.dtype)).sum(
        axis=(-2, -1)).astype(jnp.float32)
    if cfg.num_disk_as_reward:
        full = float(cfg.board_size ** 2)
        out = mine - theirs
        out = jnp.where(theirs == 0, full, out)
        out = jnp.where(mine == 0, -full, out)
        return out
    return jnp.sign(mine - theirs)


def _bcast_where(cond, new, old):
    """jnp.where with ``cond`` (N,) broadcast over trailing dims."""
    return jnp.where(cond.reshape(cond.shape + (1,) * (new.ndim - 1)),
                     new, old)


def _select_tree(cond, new, old):
    return jax.tree.map(lambda n, o: _bcast_where(cond, n, o), new, old)


class PlaneEngine:
    """int8 ``(N, B, B)`` plane representation (any board size); wraps the
    unbatched ``core.state`` transition under vmap."""

    def reset_batch(self, n: int, cfg: EnvConfig):
        return jax.vmap(lambda _: core.reset(cfg))(jnp.arange(n))

    def reset_where(self, state: OthelloState, done, cfg: EnvConfig):
        fresh = self.reset_batch(done.shape[0], cfg)
        return _select_tree(done, fresh, state)

    def step_where(self, state: OthelloState, actions, do, cfg: EnvConfig):
        """Step every game with its action, keeping the old state where
        ``~do`` (terminated/not-selected games never advance)."""
        def one(s, a):
            return core.step(s, a, cfg).state
        new = jax.vmap(one)(state, actions)
        return _select_tree(do, new, state)

    def step_all(self, state: OthelloState, actions, cfg: EnvConfig):
        """Unconditionally step every game; returns (new_state, reward)
        with the mover-perspective terminal reward — the expansion
        primitive for in-collector value lookahead (children of live
        decision states; illegal candidates terminate sudden-death and
        are masked by the caller's legal mask)."""
        res = jax.vmap(lambda s, a: core.step(s, a, cfg))(state, actions)
        return res.state, res.reward

    def featurize(self, state: OthelloState) -> jnp.ndarray:
        """(N, 4, B, B) float32 make_state planes (util.py:48-74)."""
        return jax.vmap(make_state)(state)

    def legal_flat(self, state: OthelloState) -> jnp.ndarray:
        return state.legal

    def random_legal(self, keys, state: OthelloState) -> jnp.ndarray:
        """Per-game-key uniform legal action; (N, 2) keys -> (N,) int32."""
        return jax.vmap(random_action)(keys, state.legal)

    def board_turn(self, state: OthelloState):
        """Raw signed int8 board (N, B, B) + turn (N,) — the replay/compat
        representation (othello.py board convention)."""
        return state.board, state.turn

    def greedy(self, state: OthelloState) -> jnp.ndarray:
        """Batched 1-ply greedy action (GreedyPolicy,
        simple_policies.py:57-92)."""
        return jax.vmap(greedy_action)(state)

    def outcome_for(self, state: OthelloState, pcolor,
                    cfg: EnvConfig) -> jnp.ndarray:
        return outcome_for_board(state.board, pcolor, cfg)


class BitEngine:
    """Packed uint32 word-pair representation (8x8 only, core/bitboard.py);
    state never leaves the bit layout between plies."""

    def reset_batch(self, n: int, cfg: EnvConfig):
        del cfg
        return bb.bit_reset((n,))

    def reset_where(self, state: bb.BitState, done, cfg: EnvConfig):
        fresh = bb.bit_reset((done.shape[0],))
        return _select_tree(done, fresh, state)

    def step_where(self, state: bb.BitState, actions, do, cfg: EnvConfig):
        res = bb.bit_step(
            state, actions,
            sudden_death_on_invalid_move=cfg.sudden_death_on_invalid_move,
            num_disk_as_reward=cfg.num_disk_as_reward)
        return _select_tree(do, res.state, state)

    def step_all(self, state: bb.BitState, actions, cfg: EnvConfig):
        """See PlaneEngine.step_all."""
        res = bb.bit_step(
            state, actions,
            sudden_death_on_invalid_move=cfg.sudden_death_on_invalid_move,
            num_disk_as_reward=cfg.num_disk_as_reward)
        return res.state, res.reward

    def featurize(self, state: bb.BitState) -> jnp.ndarray:
        """(N, 4, 8, 8) make_state planes straight from the packed words
        (util.py:48-74 semantics incl. the single-legal-move quirk)."""
        black = bb.unpack2(state.black).astype(jnp.float32)
        white = bb.unpack2(state.white).astype(jnp.float32)
        legal = bb.unpack2(state.legal).astype(jnp.float32)
        n = state.turn.shape[0]
        turn = jnp.broadcast_to(
            ((state.turn + 1) // 2).astype(jnp.float32)[:, None, None],
            (n, 8, 8))
        quirk = (bb.popcount2(state.legal) >= 2).astype(jnp.float32)
        legal = legal * quirk[:, None, None]
        return jnp.stack([black, white, turn, legal], axis=1)

    def legal_flat(self, state: bb.BitState) -> jnp.ndarray:
        return bb.unpack2(state.legal).reshape(state.turn.shape[0], 64)

    def random_legal(self, keys, state: bb.BitState) -> jnp.ndarray:
        return jax.vmap(bb.random_legal_bit)(keys, state.legal)

    def board_turn(self, state: bb.BitState):
        """Unpack to the signed int8 board convention (replay/compat
        layout); one unpack per ply, amortized against the net forward."""
        return bb.to_board(state), state.turn

    def greedy(self, state: bb.BitState) -> jnp.ndarray:
        """Batched 1-ply greedy (GreedyPolicy, simple_policies.py:57-92):
        argmax of per-cell flip counts over legal moves, ties to the lowest
        action index — decision-identical to ``PlaneEngine.greedy``
        (flip counts and legal masks agree bit-for-bit)."""
        black = bb.unpack2(state.black)
        white = bb.unpack2(state.white)
        is_black = (state.turn == -1)[:, None, None]
        mine = jnp.where(is_black, black, white)
        opp = jnp.where(is_black, white, black)
        flips = bitops.flip_counts(mine, opp).reshape(mine.shape[0], -1)
        scores = jnp.where(self.legal_flat(state), flips, -(1 << 20))
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    def outcome_for(self, state: bb.BitState, pcolor,
                    cfg: EnvConfig) -> jnp.ndarray:
        """Terminal outcome from the protagonist's perspective
        (othello.py:444-461 disk/winner variants; see
        train.self_play.outcome_for)."""
        white_cnt = bb.popcount2(state.white).astype(jnp.float32)
        black_cnt = bb.popcount2(state.black).astype(jnp.float32)
        is_white = pcolor == 1
        mine = jnp.where(is_white, white_cnt, black_cnt)
        theirs = jnp.where(is_white, black_cnt, white_cnt)
        if cfg.num_disk_as_reward:
            out = mine - theirs
            out = jnp.where(theirs == 0, 64.0, out)
            out = jnp.where(mine == 0, -64.0, out)
            return out
        return jnp.sign(mine - theirs)


_PLANE = PlaneEngine()
_BIT = BitEngine()


def get_engine(cfg: EnvConfig, force_plane: bool = False):
    """BitEngine for 8x8 (the fast path), PlaneEngine otherwise.
    ``force_plane`` keeps the plane representation for A/B benchmarking."""
    if cfg.board_size == 8 and not force_plane:
        return _BIT
    return _PLANE
