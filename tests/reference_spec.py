"""Clean-room numpy "specification engine" for the reference Othello rules.

This is an *independent* re-implementation of the behaviour documented in
SURVEY.md §3.2 (reference: /root/reference/othello.py:217-501), written in a
deliberately different style (dict-based scan walk) purely as a test oracle
for the JAX engine.  It is NOT imported by the framework itself.
"""

from __future__ import annotations

import numpy as np

BLACK, EMPTY, WHITE = -1, 0, 1
_DIRS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
         if (dx, dy) != (0, 0)]


class SpecGame:
    """Single-game oracle with the same step semantics as OthelloBaseEnv."""

    def __init__(self, board_size=8, sudden_death_on_invalid_move=True,
                 num_disk_as_reward=False):
        self.size = board_size
        self.sudden_death = sudden_death_on_invalid_move
        self.num_disk_as_reward = num_disk_as_reward
        self.reset()

    def reset(self):
        n = self.size
        self.board = np.zeros((n, n), dtype=np.int64)
        c = n // 2
        self.board[c - 1, c - 1] = WHITE
        self.board[c, c] = WHITE
        self.board[c, c - 1] = BLACK
        self.board[c - 1, c] = BLACK
        self.turn = BLACK
        self.terminated = False
        self.winner = EMPTY
        self.legal = self._legal_moves(self.turn)
        return self.observation()

    def observation(self):
        return self.board * self.turn

    # -- rules helpers ----------------------------------------------------
    def _ray_flips(self, board, x, y, dx, dy):
        """Cells flipped along one ray for the +1 player placing at (x, y)."""
        cells = []
        cx, cy = x + dx, y + dy
        while 0 <= cx < self.size and 0 <= cy < self.size:
            v = board[cx, cy]
            if v == BLACK:          # enemy in the canonical (+1 mover) frame
                cells.append((cx, cy))
            elif v == WHITE:
                return cells
            else:
                return []
            cx, cy = cx + dx, cy + dy
        return []

    def _legal_moves(self, player):
        canon = self.board * player
        moves = []
        for x in range(self.size):
            for y in range(self.size):
                if canon[x, y] != EMPTY:
                    continue
                if any(self._ray_flips(canon, x, y, dx, dy)
                       for dx, dy in _DIRS):
                    moves.append(x * self.size + y)
        return moves

    def count(self):
        return int((self.board == WHITE).sum()), int((self.board == BLACK).sum())

    # -- transition -------------------------------------------------------
    def step(self, action):
        if self.terminated:
            raise ValueError("game over")
        mover = self.turn
        invalid = action not in self.legal
        if not invalid:
            x, y = divmod(action, self.size)
            canon = self.board * mover
            for dx, dy in _DIRS:
                for (cx, cy) in self._ray_flips(canon, x, y, dx, dy):
                    canon[cx, cy] = WHITE
            canon[x, y] = WHITE
            self.board = canon * mover

        board_full = not (self.board == EMPTY).any()
        sudden = invalid and self.sudden_death
        done = sudden or board_full

        if done:
            self.terminated = True
            if sudden:
                self.winner = -mover
            else:
                w, b = self.count()
                self.winner = WHITE if w > b else (BLACK if b > w else EMPTY)
        else:
            self.turn = -mover
            self.legal = self._legal_moves(self.turn)
            if not self.legal:
                self.turn = mover
                self.legal = self._legal_moves(self.turn)
                if not self.legal:
                    self.terminated = True
                    w, b = self.count()
                    self.winner = (WHITE if w > b
                                   else (BLACK if b > w else EMPTY))

        reward = 0.0
        if self.terminated:
            if self.num_disk_as_reward:
                if sudden:
                    reward = -float(self.size ** 2)
                else:
                    w, b = self.count()
                    mine, theirs = (w, b) if mover == WHITE else (b, w)
                    reward = float(self.size ** 2) if theirs == 0 \
                        else float(mine - theirs)
            else:
                reward = float(self.winner * mover)
        return self.observation(), reward, self.terminated


# ---------------------------------------------------------------------------
# Scripted-policy oracles (clean-room re-statements of simple_policies.py).
# ---------------------------------------------------------------------------

def spec_greedy_action(game: SpecGame) -> int:
    """GreedyPolicy oracle: argmax over own disk count after each legal move,
    first occurrence wins ties (simple_policies.py:69-92)."""
    best_cnt, best_move = -1, None
    for move in game.legal:
        child = SpecGame(game.size, game.sudden_death,
                         game.num_disk_as_reward)
        child.board = game.board.copy()
        child.turn = game.turn
        child.legal = child._legal_moves(child.turn)
        child.step(move)
        w, b = child.count()
        cnt = w if game.turn == WHITE else b
        if cnt > best_cnt:
            best_cnt, best_move = cnt, move
    return best_move


def _spec_search(game: SpecGame, depth: int, persp: int, me: int,
                 depth_max: int):
    """MaxiMinPolicy.search oracle, including the reference's forced-pass
    quirk (simple_policies.py:111-155)."""
    if game.terminated or depth >= depth_max or len(game.legal) == 0:
        w, b = game.count()
        return (w if me == WHITE else b), None
    vals = []
    for move in game.legal:
        child = SpecGame(game.size, game.sudden_death,
                         game.num_disk_as_reward)
        child.board = game.board.copy()
        child.turn = persp
        child.legal = child._legal_moves(persp)
        child.step(move)
        if not child.terminated and child.turn == persp:
            # Other side had no moves: reference forces its (empty) turn.
            child.turn = -persp
            child.legal = child._legal_moves(-persp)
        v, _ = _spec_search(child, depth + 1, -persp, me, depth_max)
        vals.append(v)
    if persp == me:
        ix = vals.index(max(vals))
    else:
        ix = vals.index(min(vals))
    return vals[ix], game.legal[ix]


def spec_maximin_action(game: SpecGame, depth_max: int) -> int:
    _, move = _spec_search(game, 0, game.turn, game.turn, depth_max)
    return move
