"""DQN self-play / vs-scripted trainer — the TPU-native rebuild of the
``run_2agent.py`` training loop driving ``DQNAgent`` (dqn.py).

Collection follows run_2agent.py:118-160: at a color's decision point the
color's previous (state, action) pair is emitted as a transition whose
next-state is the current decision state (reward 0); at termination both
colors' outstanding pairs are emitted with the terminal outcome from each
color's perspective and next-state = terminal board.  Transitions pass
through the n-step FIFO (dqn.py:288-350) into the on-device replay, and
minibatch updates run at the reference's 1-update-per-4-transitions ratio
(train_interval, dqn.py:353-354), chunked: T plies are collected per jitted
program, then the matching number of updates runs — same data/update ratio,
coarser interleaving (documented divergence).

Modes: shared self-play (both colors learn into one agent — the batched
generalization of DQN-vs-DQN run_2agent) or protagonist-vs-scripted
(random/greedy opponent, protagonist color randomized per episode like
run_2agent.py:94-97).

Env interaction goes through ``core.engine`` — on 8x8 the game batch stays
packed as uint32 bitboard word pairs across the collection scan; boards
unpack to the replay's signed int8 layout only at transition-emission
points.  ``DQNRunConfig.force_plane`` keeps the plane engine for A/B.
"""

from __future__ import annotations

import dataclasses
import random as pyrandom
import time
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.agents.dqn import (DQNConfig, DQNState, dqn_act,
                                          dqn_init, dqn_train_batch,
                                          epsilon_at, featurize3,
                                          greedy_legal_action,
                                          make_dqn_net, make_dqn_optimizer,
                                          maybe_sync_target)
from gymothelloenv_tpu.agents.nstep import NStepFifo, nstep_init, nstep_push
from gymothelloenv_tpu.agents.replay import (Replay, ReplayConfig,
                                             replay_init, replay_insert)
from gymothelloenv_tpu.core.engine import get_engine
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.policies.scripted import greedy_action, random_action
from gymothelloenv_tpu.train.tournament import (draw_max_rand_steps,
                                                play_games_impl)
from gymothelloenv_tpu.utils.tpu import fetch_scalar
from gymothelloenv_tpu.utils.checkpoint import (load_checkpoint,
                                                save_checkpoint)


@dataclasses.dataclass(frozen=True)
class DQNRunConfig:
    num_envs: int = 128
    chunk_plies: int = 64          # plies collected per jitted chunk
    opponent: Optional[str] = None  # None=self-play | 'rand' | 'greedy'
    init_rand_steps: int = 0
    test_init_rand_steps: int = 10
    num_test_games: int = 200
    test_interval: int = 50        # chunks
    save_interval: int = 200
    seed: int = 0
    force_plane: bool = False      # keep the plane engine on 8x8 (A/B)
    # League-lite for value-based self-play (mirrors the PPO trainer's
    # opponent pool): when > 0, self-play mode plays the NON-learning
    # color greedily from a frozen snapshot drawn from the last K pool
    # entries (pushed every pool_interval chunks) instead of the live
    # net.  Motivation: shared mirror self-play collapses replay
    # diversity late in training (RESULTS.md round-2 Rainbow run decays
    # from its chunk-200-300 peak).  0 = reference-parity self-play.
    opponent_pool: int = 0
    pool_interval: int = 100       # chunks between pool snapshots
    # Replay layout under a mesh: 'replicated' (default — every device
    # holds the full ring, sampling is GLOBAL, exact single-device PER
    # semantics) or 'per-shard' (each device owns a private ring of its
    # env shard's transitions; capacity scales with the mesh and inserts
    # stay local, while sampling still follows the global prioritized
    # distribution via parallel/replay_shards.py).  Prefer per-shard
    # when the ring no longer fits on one device (docs/DESIGN.md §6).
    replay_sharding: str = "replicated"


@struct.dataclass
class PendingPair:
    """Per color (leading dim 2: [black, white]) the outstanding
    (state, action) pair awaiting its next-state."""
    board: jnp.ndarray    # int8 (2, N, B, B)
    turn: jnp.ndarray     # int8 (2, N)
    action: jnp.ndarray   # int32 (2, N)
    valid: jnp.ndarray    # bool (2, N)


@struct.dataclass
class DQNRollState:
    env: object                   # engine state pytree (BitState for 8x8)
    rand_left: jnp.ndarray
    env_keys: jnp.ndarray
    pcolor: jnp.ndarray           # int8 (N,) protagonist color (vs-scripted)
    pending: PendingPair
    fifo: NStepFifo               # 2N streams: black envs then white envs


def _split_keys(keys):
    both = jax.vmap(jax.random.split)(keys)
    return both[:, 0], both[:, 1]


class DQNTrainer:
    """``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis.  When
    set, the whole chunk runs as one GSPMD program: the env batch (and the
    pending/FIFO streams) shard over 'data', the replay stays REPLICATED
    (sampling is global — exact single-device PER semantics, the design
    the reference's single-process ``Memory`` implies, dqn.py:23-69), and
    each minibatch update gathers/grads data-parallel with an XLA-inserted
    all-reduce.  1-vs-8-device parity is asserted by
    tests/test_sharded_trainers.py."""

    def __init__(self, env_cfg: EnvConfig = None,
                 dqn_cfg: DQNConfig = None,
                 rb_cfg: ReplayConfig = None,
                 run_cfg: DQNRunConfig = None,
                 log_fn=None, mesh=None):
        self.env_cfg = env_cfg or EnvConfig(num_disk_as_reward=True)
        self.dqn_cfg = dqn_cfg or DQNConfig(
            board_size=self.env_cfg.board_size)
        self.rb_cfg = rb_cfg or ReplayConfig(
            board_size=self.env_cfg.board_size)
        self.run_cfg = run_cfg or DQNRunConfig()
        self.log_fn = log_fn
        self.mesh = mesh

        self._setup_algo()

        if self.run_cfg.replay_sharding not in ("replicated", "per-shard"):
            raise ValueError(self.run_cfg.replay_sharding)
        self._per_shard = self.run_cfg.replay_sharding == "per-shard"
        if self._per_shard:
            if mesh is None:
                raise ValueError("per-shard replay requires a mesh")
            S = mesh.shape["data"]
            for name, val in (("capacity", self.rb_cfg.capacity),
                              ("batch_size", self.dqn_cfg.batch_size),
                              ("2*num_envs", 2 * self.run_cfg.num_envs)):
                if val % S:
                    raise ValueError(f"{name}={val} not divisible by "
                                     f"data shards {S}")
            # rb_cfg.capacity is the GLOBAL capacity; each shard owns an
            # equal slice of it.
            self._per_shard_cfg = dataclasses.replace(
                self.rb_cfg, capacity=self.rb_cfg.capacity // S)

        self.key = jax.random.PRNGKey(self.run_cfg.seed)
        self.key, k = jax.random.split(self.key)
        self.agent = self._init_agent(k)
        if self._per_shard:
            from gymothelloenv_tpu.parallel.replay_shards import (
                stack_replays)
            self.replay = stack_replays(self._per_shard_cfg,
                                        mesh.shape["data"])
        else:
            self.replay = replay_init(self.rb_cfg)
        self.roll: DQNRollState = None
        self.chunk_count = 0
        self.pool: list = []
        self._pool_rng = pyrandom.Random(self.run_cfg.seed)

        self._build_steps()

    # ------------------------------------------------------------------
    # Algorithm hooks — RainbowTrainer overrides these; everything the
    # collection loop needs from the agent goes through them.
    def _setup_algo(self):
        net = make_dqn_net(self.dqn_cfg)
        self.apply_fn = lambda params, x: net.apply(params, x)
        self.optimizer = make_dqn_optimizer(self.dqn_cfg)

    def _init_agent(self, key) -> DQNState:
        return dqn_init(self.dqn_cfg, key)

    def _epsilon(self, t):
        return epsilon_at(self.dqn_cfg, t)

    def _agent_act(self, params, board, turn, legal, key, eps):
        return dqn_act(params, self.apply_fn, board, turn, legal, key, eps)

    def _agent_train_batch(self, agent, replay, key):
        if self._per_shard:
            return self._agent_train_batch_pershard(agent, replay, key)
        return dqn_train_batch(agent, replay, self.dqn_cfg, self.rb_cfg,
                               self.apply_fn, self.optimizer, key,
                               mesh=self.mesh)

    def _agent_train_batch_pershard(self, agent, stacked, key):
        """Update against the per-shard replay layout (RainbowTrainer
        overrides with its C51 core)."""
        from gymothelloenv_tpu.parallel.replay_shards import (
            dqn_train_batch_pershard)
        return dqn_train_batch_pershard(
            agent, stacked, self.dqn_cfg, self._per_shard_cfg,
            self.apply_fn, self.optimizer, key, self.mesh)

    def _opponent_greedy(self, params, board, turn, legal):
        """Batched greedy action from a frozen snapshot (opponent-pool
        mode)."""
        q = self.apply_fn(params, featurize3(board, turn))
        return greedy_legal_action(q, legal)

    def _eval_act(self, params, key, state):
        """epsilon=0.05 greedy eval action (get_action_at_test,
        dqn.py:478-488)."""
        k_eps, k_rand = jax.random.split(key)
        q = self.apply_fn(params, featurize3(
            state.board, state.turn)[None])[0]
        greedy = greedy_legal_action(q, state.legal)
        rand = random_action(k_rand, state.legal)
        explore = (jax.random.uniform(k_eps, ())
                   < self.dqn_cfg.test_epsilon)
        return jnp.where(explore, rand, greedy)

    # ------------------------------------------------------------------
    def _build_steps(self):
        env_cfg = self.env_cfg
        dqn_cfg = self.dqn_cfg
        rb_cfg = self.rb_cfg
        run_cfg = self.run_cfg
        N = run_cfg.num_envs
        B = env_cfg.board_size
        n_step = dqn_cfg.n_step
        use_pool = (run_cfg.opponent_pool > 0
                    and run_cfg.opponent is None)
        # Pool mode reuses the vs-opponent machinery (pcolor learner
        # masking); the opponent is a frozen snapshot, not a script.
        selfplay = run_cfg.opponent is None and not use_pool
        opponent = run_cfg.opponent
        eng = get_engine(env_cfg, run_cfg.force_plane)

        def init_roll(key):
            key, k_env, k_color, k_rand = jax.random.split(key, 4)
            env = eng.reset_batch(N, env_cfg)
            rand_left = jax.vmap(draw_max_rand_steps, in_axes=(0, None))(
                jax.random.split(k_rand, N), run_cfg.init_rand_steps)
            pcolor = (jax.random.randint(k_color, (N,), 0, 2) * 2
                      - 1).astype(jnp.int8)
            empty = PendingPair(
                board=jnp.zeros((2, N, B, B), jnp.int8),
                turn=jnp.zeros((2, N), jnp.int8),
                action=jnp.zeros((2, N), jnp.int32),
                valid=jnp.zeros((2, N), bool))
            return DQNRollState(
                env=env, rand_left=rand_left,
                env_keys=jax.random.split(k_env, N), pcolor=pcolor,
                pending=empty, fifo=nstep_init(n_step, 2 * N, B))

        self._init_roll = jax.jit(init_roll)

        def learner_mask(roll, c_val):
            if selfplay:
                return jnp.ones((N,), bool)
            return roll.pcolor == c_val

        def scripted_act(env, keys):
            if opponent == "rand":
                return eng.random_legal(keys, env)
            if opponent == "greedy":
                return eng.greedy(env)
            raise ValueError(opponent)

        def push_color(fifo, c_idx, pending, mask, reward, done_flag,
                       next_board, next_turn):
            """Push color c_idx's pendings (masked) into its stream half;
            returns (fifo, emitted over 2N streams)."""
            do = jnp.zeros((2 * N,), bool).at[
                c_idx * N:(c_idx + 1) * N].set(mask)

            def full(x):
                pad = jnp.zeros_like(x)
                parts = [x, pad] if c_idx == 0 else [pad, x]
                return jnp.concatenate(parts)

            return nstep_push(
                fifo, dqn_cfg.gamma,
                full(pending.board[c_idx]), full(pending.turn[c_idx]),
                full(pending.action[c_idx]), full(reward),
                full(next_board), full(next_turn),
                full(done_flag), do)

        def make_ply(params, snap_params, eps):
            def ply(carry, _):
                roll, key = carry
                key, k_act, k_opp = jax.random.split(key, 3)
                env = roll.env
                live = ~env.terminated
                board, turn = eng.board_turn(env)
                legal = eng.legal_flat(env)
                fifo = roll.fifo
                pending = roll.pending
                ems = []

                # 1. pre-action emission for the mover's color.
                for c_idx, c_val in ((0, -1), (1, 1)):
                    mask = (live & (turn == c_val)
                            & pending.valid[c_idx]
                            & learner_mask(roll, c_val))
                    fifo, em = push_color(
                        fifo, c_idx, pending, mask,
                        jnp.zeros((N,)), jnp.zeros((N,), bool),
                        board, turn)
                    ems.append(em)
                    pending = pending.replace(
                        valid=pending.valid.at[c_idx].set(
                            pending.valid[c_idx] & ~mask))

                # 2. mover acts (epsilon-greedy learner / scripted).
                learner_actions = self._agent_act(
                    params, board, turn, legal, k_act, eps)
                if selfplay:
                    actions = learner_actions
                else:
                    if use_pool:
                        opp_actions = self._opponent_greedy(
                            snap_params, board, turn, legal)
                    else:
                        opp_actions = scripted_act(
                            env, jax.random.split(k_opp, N))
                    actions = jnp.where(turn == roll.pcolor,
                                        learner_actions, opp_actions)

                for c_idx, c_val in ((0, -1), (1, 1)):
                    mask = live & (turn == c_val) & learner_mask(
                        roll, c_val)
                    pending = PendingPair(
                        board=pending.board.at[c_idx].set(
                            jnp.where(mask[:, None, None], board,
                                      pending.board[c_idx])),
                        turn=pending.turn.at[c_idx].set(
                            jnp.where(mask, turn,
                                      pending.turn[c_idx])),
                        action=pending.action.at[c_idx].set(
                            jnp.where(mask, actions,
                                      pending.action[c_idx])),
                        valid=pending.valid.at[c_idx].set(
                            pending.valid[c_idx] | mask))

                # 3. step live games with the random-opening override.
                env_keys, sub = _split_keys(roll.env_keys)
                use_rand = (roll.rand_left > 0) & live
                exec_a = jnp.where(use_rand, eng.random_legal(sub, env),
                                   actions)
                env = eng.step_where(env, exec_a, live, env_cfg)
                rand_left = jnp.where(use_rand, roll.rand_left - 1,
                                      roll.rand_left)

                # 4. terminal emissions for both colors.
                term_now = env.terminated & live
                next_board, next_turn = eng.board_turn(env)
                for c_idx, c_val in ((0, -1), (1, 1)):
                    outcome = eng.outcome_for(
                        env, jnp.full((N,), c_val, jnp.int8), env_cfg)
                    mask = (term_now & pending.valid[c_idx]
                            & learner_mask(roll, c_val))
                    fifo, em = push_color(
                        fifo, c_idx, pending, mask,
                        outcome * dqn_cfg.reward_scale,
                        jnp.ones((N,), bool), next_board, next_turn)
                    ems.append(em)
                    pending = pending.replace(
                        valid=pending.valid.at[c_idx].set(
                            pending.valid[c_idx] & ~mask))

                # 5. reset finished games.
                env_keys, sub = _split_keys(env_keys)
                k_rand, k_color = _split_keys(sub)
                env = eng.reset_where(env, term_now, env_cfg)
                new_rleft = jax.vmap(draw_max_rand_steps,
                                     in_axes=(0, None))(
                    k_rand, run_cfg.init_rand_steps)
                rand_left = jnp.where(term_now, new_rleft, rand_left)
                new_pc = (jax.vmap(
                    lambda k: jax.random.randint(k, (), 0, 2))(k_color)
                    * 2 - 1).astype(jnp.int8)
                pcolor = jnp.where(term_now, new_pc, roll.pcolor)

                roll = DQNRollState(env=env, rand_left=rand_left,
                                    env_keys=env_keys, pcolor=pcolor,
                                    pending=pending, fifo=fifo)
                emitted = jax.tree.map(lambda *xs: jnp.stack(xs), *ems)
                return (roll, key), emitted
            return ply

        mesh = self.mesh
        if mesh is not None:
            from gymothelloenv_tpu.parallel.sharding import (
                constrain_batch_axes)

        def train_chunk(agent: DQNState, replay: Replay,
                        roll: DQNRollState, key, snap_params=None):
            if mesh is not None:
                # Pin the batch layout: env leaves (N, ...), pending pairs
                # (2, N, ...), n-step FIFO streams (k, 2N, ...) all shard
                # their batch axis over 'data'; GSPMD propagates it through
                # the collection scan.
                roll = constrain_batch_axes(roll, mesh, (N, 2 * N))
            key, k_collect, k_train = jax.random.split(key, 3)
            eps = self._epsilon(agent.t)
            (roll, _), em = jax.lax.scan(
                make_ply(agent.params, snap_params, eps),
                (roll, k_collect), None, length=run_cfg.chunk_plies)

            # Flatten (T, 4, n, 2N, ...) emission slots -> (K, ...).
            def flat(x):
                return x.reshape((-1,) + x.shape[4:])

            valid = flat(em.valid)
            if self._per_shard:
                # Each device inserts only its own env shard's rows
                # (stream axis 2N pre-sharded by the collection scan) —
                # no emission bytes cross the interconnect.
                from gymothelloenv_tpu.parallel.replay_shards import (
                    pershard_insert)
                replay = pershard_insert(mesh, replay,
                                         self._per_shard_cfg, em)
            else:
                replay = replay_insert(
                    replay, rb_cfg, flat(em.board), flat(em.turn),
                    flat(em.action), flat(em.reward), flat(em.next_board),
                    flat(em.next_turn), flat(em.done), valid)
            t_old = agent.t
            agent = agent.replace(
                t=agent.t + valid.sum(dtype=jnp.int32))

            # Updates at the reference's 1-per-train_interval-transitions
            # ratio; ~1 learner transition per ply per learning color.
            per_ply = 2 if selfplay else 1
            updates = max(1, (run_cfg.chunk_plies * N * per_ply)
                          // (2 * dqn_cfg.train_interval))
            do_train = agent.t >= dqn_cfg.initial_replay_size

            def body(carry, k):
                agent, replay = carry

                def run(_):
                    return self._agent_train_batch(agent, replay, k)

                def skip(_):
                    return agent, replay, jnp.float32(0.0)

                agent2, replay2, loss = jax.lax.cond(do_train, run, skip,
                                                     None)
                return (agent2, replay2), loss

            (agent, replay), losses = jax.lax.scan(
                body, (agent, replay), jax.random.split(k_train, updates))

            crossed = (agent.t // dqn_cfg.target_update_interval) != \
                (t_old // dqn_cfg.target_update_interval)
            agent = maybe_sync_target(agent, dqn_cfg, crossed)
            metrics = {"loss": losses.mean(),
                       "epsilon": self._epsilon(agent.t),
                       "transitions": agent.t,
                       "replay_size": (replay.size.sum()
                                       if self._per_shard
                                       else replay.size)}
            return agent, replay, roll, metrics

        self._train_chunk = jax.jit(train_chunk, donate_argnums=(0, 1, 2))

        def rand_policy(key, state):
            return random_action(key, state.legal)

        def greedy_policy_fn(key, state):
            del key
            return greedy_action(state)

        def eval_step(params, key):
            """Greedy eval vs scripted, colors split half/half (DQN:
            epsilon=0.05 per get_action_at_test dqn.py:478-488; Rainbow:
            deterministic mean weights)."""
            def net_act(k, state):
                return self._eval_act(params, k, state)

            n = run_cfg.num_test_games // 2
            results = {}
            for name, opp in (("rand", rand_policy),
                              ("greedy", greedy_policy_fn)):
                key, k1, k2 = jax.random.split(key, 3)
                as_black = play_games_impl(
                    k1, env_cfg, net_act, opp, n,
                    run_cfg.test_init_rand_steps)
                as_white = play_games_impl(
                    k2, env_cfg, opp, net_act, n,
                    run_cfg.test_init_rand_steps)
                results[name] = ((as_black == -1).sum()
                                 + (as_white == 1).sum()) / (2 * n)
            return results

        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def ensure_initialized(self):
        if self.roll is None:
            self.key, k = jax.random.split(self.key)
            self.roll = self._init_roll(k)
            if self.mesh is not None:
                from gymothelloenv_tpu.parallel.sharding import (
                    place_replicated, shard_batch_axes)
                N = self.run_cfg.num_envs
                self.roll = jax.device_put(
                    self.roll,
                    shard_batch_axes(self.mesh, self.roll, (N, 2 * N)))
                self.agent = place_replicated(self.agent, self.mesh)
                if self._per_shard:
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P
                    self.replay = jax.device_put(
                        self.replay,
                        jax.tree.map(
                            lambda _: NamedSharding(self.mesh, P("data")),
                            self.replay))
                else:
                    self.replay = place_replicated(self.replay, self.mesh)

    def _snapshot_params(self):
        return jax.tree.map(lambda x: x.copy(), self.agent.params)

    def train(self, num_chunks: int, log_every: int = 10,
              checkpoint_path: str = None):
        self.ensure_initialized()
        use_pool = (self.run_cfg.opponent_pool > 0
                    and self.run_cfg.opponent is None)
        t0 = time.time()
        for c in range(num_chunks):
            self.key, k = jax.random.split(self.key)
            snap = None
            if use_pool:
                if not self.pool:
                    self.pool.append(self._snapshot_params())
                snap = self.pool[self._pool_rng.randrange(len(self.pool))]
            self.agent, self.replay, self.roll, metrics = \
                self._train_chunk(self.agent, self.replay, self.roll, k,
                                  snap)
            self.chunk_count += 1
            if use_pool and \
                    self.chunk_count % self.run_cfg.pool_interval == 0:
                self.pool.append(self._snapshot_params())
                if len(self.pool) > self.run_cfg.opponent_pool:
                    self.pool.pop(0)
            if (c + 1) % log_every == 0 or c == num_chunks - 1:
                m = {k_: fetch_scalar(v) for k_, v in metrics.items()}
                m["transitions_per_sec"] = m["transitions"] \
                    / (time.time() - t0 + 1e-9)
                self._log(self.chunk_count, m)
            if self.chunk_count % self.run_cfg.test_interval == 0:
                self.key, k = jax.random.split(self.key)
                wins = {k_: fetch_scalar(v) for k_, v in
                        self._eval_step(self.agent.params, k).items()}
                self._log(self.chunk_count,
                          {f"win%({k_})": v for k_, v in wins.items()})
            if checkpoint_path and \
                    self.chunk_count % self.run_cfg.save_interval == 0:
                # A {step} placeholder keeps one file per snapshot
                # (post-hoc early stopping — the recipe RESULTS.md
                # documents for self-play strength peaks).
                self.save(checkpoint_path.format(step=self.chunk_count))
        if checkpoint_path:
            self.save(checkpoint_path.format(step=self.chunk_count))

    def evaluate(self):
        self.key, k = jax.random.split(self.key)
        return {k_: fetch_scalar(v)
                for k_, v in self._eval_step(self.agent.params, k).items()}

    def _log(self, step, metrics):
        if self.log_fn:
            self.log_fn(step, metrics)
        else:
            text = " ".join(f"{k}={v:.4g}" for k, v in metrics.items())
            print(f"[chunk {step}] {text}", flush=True)

    def save(self, path: str):
        save_checkpoint(path, self.chunk_count, self.agent.params,
                        self.agent.opt_state,
                        extra={"t": int(fetch_scalar(self.agent.t))})

    def load(self, path: str):
        step, params, opt_state, extra = load_checkpoint(
            path, self.agent.params, self.agent.opt_state)
        self.agent = self.agent.replace(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=opt_state, t=jnp.int32(extra.get("t", 0)))
        self.chunk_count = step
