"""Reference-API environment classes (drop-in for ``othello.py``).

These host-side wrappers expose the exact Gym-style interface of the
reference — ``OthelloBaseEnv`` / ``SimpleOthelloEnv`` / ``OthelloEnv``
(othello.py:21-501) with numpy observations, ``possible_moves`` lists,
``player_turn`` ints, print side-effects, and ``np.random.RandomState``
opening draws in the reference's exact order — while every rules
computation runs through the jitted JAX engine.

A user of omurammm/GymOthelloEnv can switch imports and keep their driver
loops unchanged; for throughput, use the batched functional API instead
(gymothelloenv_tpu.envs).

PROVENANCE NOTE: this module is the repo's declared parity shim.  Its
``step``/``reset`` control flow necessarily tracks ``othello.py:60-214``
statement by statement — identical ``np.random.RandomState`` call order,
identical retry/opponent-move sequencing and identical print side-effects
are *hard requirements* for the golden-transcript tests
(tests/test_compat.py, tests/golden/) to certify drop-in behavior, and
those constraints determine the code shape.  No reference code is copied:
every rules/legality/termination computation is delegated to the JAX
engine above, and this mirroring is intentionally confined to ``compat/``
— the rest of the repo shares no structure with the reference.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.state import EnvConfig, OthelloState

BLACK_DISK = -1
NO_DISK = 0
WHITE_DISK = 1


@functools.cache
def _jit_step(cfg: EnvConfig):
    return jax.jit(core.step, static_argnums=2)


@functools.cache
def _jit_legal(cfg: EnvConfig):
    B = cfg.board_size
    return jax.jit(lambda board, turn: core.legal_actions(board, turn))


class OthelloBaseEnv:
    """Host-side single game over the JAX engine (othello.py:217-501)."""

    metadata = {"render.modes": ["np_array", "human"]}

    def __init__(self, board_size=8, sudden_death_on_invalid_move=True,
                 num_disk_as_reward=False, possible_actions_in_obs=False,
                 mute=False):
        self.board_size = max(4, board_size)
        self.sudden_death_on_invalid_move = sudden_death_on_invalid_move
        self.num_disk_as_reward = num_disk_as_reward
        self.possible_actions_in_obs = possible_actions_in_obs
        self.mute = mute
        self.cfg = EnvConfig(
            board_size=self.board_size,
            sudden_death_on_invalid_move=sudden_death_on_invalid_move,
            num_disk_as_reward=num_disk_as_reward)
        self._state: OthelloState = None
        self.reset()

    # -- accessors mirroring the reference attributes -------------------
    @property
    def board_state(self) -> np.ndarray:
        return np.asarray(self._state.board, dtype=np.int64)

    @property
    def player_turn(self) -> int:
        return int(self._state.turn)

    @property
    def possible_moves(self):
        return np.nonzero(np.asarray(self._state.legal))[0].tolist()

    @property
    def terminated(self) -> bool:
        return bool(self._state.terminated)

    @property
    def winner(self) -> int:
        return int(self._state.winner)

    # -- API ------------------------------------------------------------
    def reset(self):
        self._state = jax.jit(
            core.reset, static_argnums=0)(self.cfg)
        return self.get_observation()

    def get_observation(self):
        obs = self.board_state * self.player_turn
        if self.possible_actions_in_obs:
            grid = np.zeros(self.board_size ** 2, dtype=bool)
            grid[self.possible_moves] = True
            return np.concatenate(
                [obs[None], grid.reshape(1, self.board_size,
                                         self.board_size)], axis=0)
        return obs

    def set_board_state(self, board_state, perspective=WHITE_DISK):
        """othello.py:380-389; recomputes the legal mask for the current
        turn."""
        state = np.asarray(board_state)
        if state.ndim > 2:
            state = state[0]
        board = jnp.asarray(state * perspective, jnp.int8)
        self._state = self._state.replace(
            board=board,
            legal=core.legal_actions(board, self._state.turn))

    def set_player_turn(self, turn):
        turn = jnp.int8(turn)
        self._state = self._state.replace(
            turn=turn,
            legal=core.legal_actions(self._state.board, turn))

    def count_disks(self):
        b = self.board_state
        return int((b == WHITE_DISK).sum()), int((b == BLACK_DISK).sum())

    def step(self, action):
        if self.terminated:
            raise ValueError("Game has terminated!")
        pre_moves = self.possible_moves
        res = _jit_step(self.cfg)(self._state, jnp.int32(int(action)),
                                  self.cfg)
        prev_turn = self.player_turn
        self._state = res.state
        done = bool(res.done)
        if done and not self.mute:
            self._print_outcome(int(action) not in pre_moves)
        elif (not done and self.player_turn == prev_turn
              and not self.mute):
            # Turn bounced back: the opponent had no move.  (The reference
            # prints nothing here; the 'No possible moves for either
            # party.' print only fires at the stuck terminal,
            # othello.py:440-441 — handled in _print_outcome.)
            pass
        return (self.get_observation(), float(res.reward), done, None)

    def _print_outcome(self, invalid_action):
        sudden = invalid_action and self.sudden_death_on_invalid_move
        if sudden:
            print("sudden death due to rule violation")
            print("BLACK wins" if self.winner == BLACK_DISK
                  else "WHITE wins")
            return
        w, b = self.count_disks()
        if w + b < self.board_size ** 2:
            print("No possible moves for either party.")
        print(f"white: {w}, black: {b}")
        if self.winner == WHITE_DISK:
            print("WHITE wins")
        elif self.winner == BLACK_DISK:
            print("BLACK wins")
        else:
            print("DRAW")

    def print_board(self, print_valid_moves=True):
        """ASCII board (othello.py:345-361)."""
        valid_actions = self.possible_moves
        board = self.board_state.copy().ravel()
        if print_valid_moves:
            for p in valid_actions:
                board[p] = 2
        board = board.reshape(self.board_size, self.board_size)
        print("Turn: {}".format(
            "WHITE" if self.player_turn == WHITE_DISK else "BLACK"))
        print("Valid actions: {}".format(valid_actions))
        for row in board:
            print(" ".join("BOWV"[int(x) + 1] for x in row))
        print("-" * 10)

    def render(self, mode="np_array", close=False):
        if close:
            return
        if mode == "np_array":
            self.print_board()
        else:
            # The reference's pyglet GUI is broken in its snapshot
            # (othello.py:5 commented import); ASCII is the working path.
            self.print_board()

    def close(self):
        pass


class SimpleOthelloEnv:
    """othello.py:21-93 — base env + per-reset random-opening counter with
    the reference's exact RandomState draw order."""

    metadata = {"render.modes": ["np_array", "human"]}

    def __init__(self, board_size=8, initial_rand_steps=0, seed=0,
                 sudden_death_on_invalid_move=True, render_in_step=False,
                 num_disk_as_reward=False, possible_actions_in_obs=False,
                 mute=False):
        self.board_size = board_size
        self.num_disk_as_reward = num_disk_as_reward
        self.env = OthelloBaseEnv(
            board_size=board_size,
            sudden_death_on_invalid_move=sudden_death_on_invalid_move,
            num_disk_as_reward=num_disk_as_reward,
            possible_actions_in_obs=possible_actions_in_obs,
            mute=mute)
        self.mute = mute
        self.render_in_step = render_in_step
        self.initial_rand_steps = initial_rand_steps
        self.rand_seed = seed
        self.rnd = np.random.RandomState(seed=self.rand_seed)
        self.max_rand_steps = 0
        self.rand_step_cnt = 0
        self.sudden_death_on_invalid_move = sudden_death_on_invalid_move

    def seed(self, seed=None):
        if seed is not None:
            self.rand_seed = seed
            self.rnd = np.random.RandomState(seed=self.rand_seed)

    def reset(self):
        obs = self.env.reset()
        self.max_rand_steps = self.rnd.randint(
            low=0, high=self.initial_rand_steps // 2 + 1) * 2
        self.rand_step_cnt = 0
        if not self.mute:
            print("The initial {} steps will be random".format(
                self.max_rand_steps))
        return obs

    def step(self, action):
        if self.rand_step_cnt < self.max_rand_steps:
            ix = self.rnd.randint(0, len(self.possible_moves))
            action = self.possible_moves[ix]
            self.rand_step_cnt += 1
        obs, reward, done, _ = self.env.step(action)
        if self.render_in_step:
            self.render()
        return obs, reward, done, None

    def render(self, mode="np_array", close=False):
        self.env.render(mode=mode, close=close)

    def close(self):
        self.env.close()

    @property
    def player_turn(self):
        return self.env.player_turn

    @property
    def possible_moves(self):
        return self.env.possible_moves


class OthelloEnv:
    """othello.py:96-214 — embedded-opponent env: the opponent policy plays
    inside ``step``; rewards are returned from the protagonist's
    perspective (negated when the opponent's reply ended the exchange)."""

    metadata = {"render.modes": ["np_array", "human"]}

    def __init__(self, white_policy=None, black_policy=None,
                 protagonist=WHITE_DISK, board_size=8,
                 initial_rand_steps=0, seed=0,
                 sudden_death_on_invalid_move=True, render_in_step=False,
                 num_disk_as_reward=False, possible_actions_in_obs=False,
                 mute=False):
        self.board_size = board_size
        self.num_disk_as_reward = num_disk_as_reward
        self.env = OthelloBaseEnv(
            board_size=board_size,
            sudden_death_on_invalid_move=sudden_death_on_invalid_move,
            num_disk_as_reward=num_disk_as_reward,
            possible_actions_in_obs=possible_actions_in_obs,
            mute=mute)
        self.mute = mute
        self.render_in_step = render_in_step
        self.initial_rand_steps = initial_rand_steps
        self.rand_seed = seed
        self.rnd = np.random.RandomState(seed=self.rand_seed)
        self.max_rand_steps = 0
        self.rand_step_cnt = 0
        self.protagonist = protagonist
        self._white_policy = white_policy
        self._black_policy = black_policy
        if self.protagonist == BLACK_DISK:
            self.opponent = white_policy
        else:
            self.opponent = black_policy

    def switch_color(self):
        # NOTE: like the reference (othello.py:138-142), only the
        # protagonist color flips — ``self.opponent`` keeps pointing at the
        # same policy object, which now plays the other color.
        if self.protagonist == BLACK_DISK:
            self.protagonist = WHITE_DISK
        else:
            self.protagonist = BLACK_DISK

    def seed(self, seed=None):
        if seed is not None:
            self.rand_seed = seed
            self.rnd = np.random.RandomState(seed=self.rand_seed)
            if self.opponent is not None and hasattr(self.opponent, "seed"):
                self.opponent.seed(self.rand_seed)

    def reset(self):
        obs = self.env.reset()
        self.max_rand_steps = self.rnd.randint(
            low=0, high=self.initial_rand_steps // 2 + 1) * 2
        self.rand_step_cnt = 0
        if not self.mute:
            print("The initial {} steps will be random".format(
                self.max_rand_steps))
        if hasattr(self.opponent, "reset"):
            try:
                self.opponent.reset(self)
            except TypeError:
                pass
        if self.env.player_turn == self.protagonist:
            return obs
        action = self.opponent.get_action(obs)
        obs, _, done, _ = self.env.step(action)
        if done:
            if not self.mute:
                print("done==True in reset(), do it again.")
            return self.reset()
        return obs

    def step(self, action):
        assert self.env.player_turn == self.protagonist
        if self.rand_step_cnt < self.max_rand_steps:
            ix = self.rnd.randint(0, len(self.possible_moves))
            action = self.possible_moves[ix]
            self.rand_step_cnt += 1

        obs, reward, done, _ = self.env.step(action)
        if self.render_in_step:
            self.render()
        if done:
            return obs, reward, done, None

        while not done and self.env.player_turn != self.protagonist:
            if self.rand_step_cnt < self.max_rand_steps:
                ix = self.rnd.randint(0, len(self.possible_moves))
                opponent_move = self.possible_moves[ix]
                self.rand_step_cnt += 1
            else:
                opponent_move = self.opponent.get_action(obs)
            obs, reward, done, _ = self.env.step(opponent_move)
            if self.render_in_step:
                self.render()
        return obs, -reward, done, None

    def render(self, mode="np_array", close=False):
        self.env.render(mode=mode, close=close)

    def close(self):
        self.env.close()

    @property
    def player_turn(self):
        return self.env.player_turn

    @property
    def possible_moves(self):
        return self.env.possible_moves
