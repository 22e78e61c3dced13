"""Teacher-vs-student PPO — the TPU-native rebuild of
``ppo_run_teacher_vs_student.py`` (+ its worker :425-572 and
``PPOTeacherStudentEnvs``).

Two Policy networks play each other: per game the teacher takes one color
(redrawn at every game reset — the reference redraws per master episode,
:220; per-game is the same distribution) and the student the other.  Both
roles record PPO transitions of their own decisions.  The student's
terminal reward is the game outcome; the TEACHER's terminal reward is the
student's measured improvement, ``sum_k (win_avg[k] - last_win_avg[k])``
over the {rand, greedy} eval opponents (worker :456-474) — win averages are
refreshed by the periodic student eval (test_interval, :367-377) and fed to
collection as a scalar.

Collection is a slot scan; each slot appends a fixed set of per-role
records (student: 2 pass-tolerant plies + terminal + fresh-game ply;
teacher: terminal + decision), each a weighted stream slot.  Game-boundary
bubbles carry weight 0 and are skipped transparently by the masked GAE
(agents/ppo.compute_gae_masked) — replacing the reference's role-buffer
flush protocol (driver :251-319) and its zero-filler insertions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                          make_optimizer, ppo_update)
from gymothelloenv_tpu.core.engine import get_engine
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.policies.scripted import (greedy_policy,
                                                 random_policy)
from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                 make_network,
                                                 net_tournament_policy)
from gymothelloenv_tpu.train.self_play import (masked_step, reset_done,
                                               split_each)
from gymothelloenv_tpu.train.tournament import (draw_max_rand_steps,
                                                play_games_impl)
from gymothelloenv_tpu.utils.tpu import fetch_scalar
from gymothelloenv_tpu.utils.checkpoint import (load_checkpoint,
                                                save_checkpoint)


@dataclasses.dataclass(frozen=True)
class TeacherStudentConfig:
    num_envs: int = 128
    num_steps: int = 32            # slots per chunk (2 role-records each)
    train_teacher: bool = True
    init_rand_steps: int = 0
    test_init_rand_steps: int = 10
    num_test_games: int = 200
    test_interval: int = 10        # chunks (reference: 10 episodes)
    teacher_test_interval: int = 200
    save_interval: int = 200
    seed: int = 0
    # Capacity knobs (round-5 TS strength recipe — the other families
    # got theirs in rounds 1-3); width_mult=2 lets the teacher
    # warm-start from the wide2 self-play checkpoints.
    hidden_size: int = 512
    width_mult: int = 1


@struct.dataclass
class RolePending:
    obs: jnp.ndarray      # (N, C, B, B)
    action: jnp.ndarray   # (N,)
    logp: jnp.ndarray
    value: jnp.ndarray
    legal: jnp.ndarray    # (N, A)
    valid: jnp.ndarray    # (N,)


@struct.dataclass
class TSState:
    env: object                    # engine state pytree, batched (N, ...)
    rand_left: jnp.ndarray
    env_keys: jnp.ndarray
    tcolor: jnp.ndarray            # int8 (N,) teacher's color per game
    pending_t: RolePending
    pending_s: RolePending


def _empty_pending(N, C, B, A):
    # obs stored int8 ({0,1} planes) — see agents.ppo.Transition.
    return RolePending(
        obs=jnp.zeros((N, C, B, B), jnp.int8),
        action=jnp.zeros((N,), jnp.int32),
        logp=jnp.zeros((N,)), value=jnp.zeros((N,)),
        legal=jnp.zeros((N, A), bool), valid=jnp.zeros((N,), bool))


def _decide(params, apply_fn, eng, env, keys):
    obs = eng.featurize(env)
    legal = eng.legal_flat(env)
    logits, value, _ = apply_fn(params, obs)
    dist = MaskedCategorical(logits=logits, mask=legal)
    # One batched categorical from a single key — per-row vmapped keys
    # were the top cost of the collection scan (train/self_play.py
    # policy_sample, scripts/trace_collect.py).
    action = dist.sample(keys[0])
    logp = dist.log_prob(action)
    return obs, action, logp, value, legal


def _emit(pending: RolePending, reward, done, emit_mask):
    """Weighted Transition record from a pending decision; weight 0 rows
    are GAE-transparent bubbles."""
    w = emit_mask & pending.valid
    rec = Transition(
        obs=pending.obs, action=pending.action, logp=pending.logp,
        value=pending.value,
        reward=jnp.where(w, reward, 0.0),
        done=jnp.where(w, done, True),
        legal=pending.legal)
    return rec, w, pending.replace(valid=pending.valid & ~w)


def _set_pending(pending: RolePending, mask, obs, action, logp, value,
                 legal):
    def sel(new, old):
        return jnp.where(mask.reshape((-1,) + (1,) * (old.ndim - 1)), new,
                         old)
    return RolePending(
        obs=sel(obs.astype(pending.obs.dtype), pending.obs),
        action=sel(action, pending.action),
        logp=sel(logp, pending.logp), value=sel(value, pending.value),
        legal=sel(legal, pending.legal),
        valid=pending.valid | mask)


def ts_init(key, cfg: EnvConfig, num_envs: int,
            init_rand_steps: int, force_plane: bool = False) -> TSState:
    eng = get_engine(cfg, force_plane)
    key, k_env, k_color, k_rand = jax.random.split(key, 4)
    env = eng.reset_batch(num_envs, cfg)
    rand_left = jax.vmap(draw_max_rand_steps, in_axes=(0, None))(
        jax.random.split(k_rand, num_envs), init_rand_steps)
    tcolor = (jax.random.randint(k_color, (num_envs,), 0, 2) * 2
              - 1).astype(jnp.int8)
    B = cfg.board_size
    return TSState(env=env, rand_left=rand_left,
                   env_keys=jax.random.split(k_env, num_envs),
                   tcolor=tcolor,
                   pending_t=_empty_pending(num_envs, 4, B, B * B),
                   pending_s=_empty_pending(num_envs, 4, B, B * B))


def collect_ts_rollout(params_t, params_s, apply_fn, ts: TSState,
                       cfg: EnvConfig, num_steps: int,
                       init_rand_steps: int,
                       teacher_reward: jnp.ndarray, key,
                       force_plane: bool = False):
    """Scan ``num_steps`` slots.  Returns
    (ts_state, (roll_t (2T,N), w_t, boot_t), (roll_s (4T,N), w_s, boot_s)).
    Stream records are chronological per game; weight-0 rows are bubbles.
    """
    N = ts.tcolor.shape[0]
    eng = get_engine(cfg, force_plane)
    # Static: drops the random-opening override (and its per-ply key
    # splits) out of the compiled scan when unused (see
    # self_play.masked_step).
    ro = init_rand_steps > 0

    def student_ply(env, rand_left, env_keys, tcolor, pending_s):
        """One student ply where it's the student's turn: emit the previous
        student pending (the game demonstrably continued), decide, step."""
        turn_now = (~env.terminated) & (env.turn == -tcolor)
        rec, w, pending_s = _emit(pending_s, jnp.zeros((N,)),
                                  jnp.zeros((N,), bool), turn_now)
        env_keys, dk = split_each(env_keys)
        obs, action, logp, value, legal = _decide(params_s, apply_fn, eng,
                                                  env, dk)
        pending_s = _set_pending(pending_s, turn_now, obs, action, logp,
                                 value, legal)
        env, rand_left, env_keys = masked_step(
            eng, env, rand_left, env_keys, action, turn_now, cfg, ro)
        return env, rand_left, env_keys, pending_s, (rec, w)

    def slot(carry, _):
        ts, key = carry
        env, rand_left, env_keys = ts.env, ts.rand_left, ts.env_keys
        tcolor = ts.tcolor
        pending_t, pending_s = ts.pending_t, ts.pending_s
        s_records = []

        # Phase A: up to 2 student plies toward the teacher's turn (the
        # second covers a pass-induced consecutive student move).
        for _ in range(2):
            env, rand_left, env_keys, pending_s, rw = student_ply(
                env, rand_left, env_keys, tcolor, pending_s)
            s_records.append(rw)

        # Phase B: terminal emissions for both roles.
        term = env.terminated
        s_out = eng.outcome_for(env, (-tcolor).astype(jnp.int8), cfg)
        rec_t_term, w_t_term, pending_t = _emit(
            pending_t, jnp.broadcast_to(teacher_reward, (N,)),
            jnp.ones((N,), bool), term)
        rec_s_term, w_s_term, pending_s = _emit(
            pending_s, s_out, jnp.ones((N,), bool), term)
        s_records.append((rec_s_term, w_s_term))

        # Phase C: reset finished games with fresh teacher colors.
        env, rand_left, tcolor, env_keys = reset_done(
            eng, env, rand_left, ts.tcolor, env_keys, term, cfg,
            init_rand_steps)

        # Phase C2: student (black) opening ply of fresh games; also mops
        # up a rare triple-consecutive student move.
        env, rand_left, env_keys, pending_s, rw = student_ply(
            env, rand_left, env_keys, tcolor, pending_s)
        s_records.append(rw)

        # Phase D: teacher decision — emit the previous teacher pending
        # (non-terminal), decide, step.
        teacher_turn = (~env.terminated) & (env.turn == tcolor)
        rec_t_pre, w_t_pre, pending_t = _emit(
            pending_t, jnp.zeros((N,)), jnp.zeros((N,), bool),
            teacher_turn)
        env_keys, dk = split_each(env_keys)
        obs, action, logp, value, legal = _decide(params_t, apply_fn, eng,
                                                  env, dk)
        pending_t = _set_pending(pending_t, teacher_turn, obs, action,
                                 logp, value, legal)
        env, rand_left, env_keys = masked_step(
            eng, env, rand_left, env_keys, action, teacher_turn, cfg, ro)

        new_ts = TSState(env=env, rand_left=rand_left, env_keys=env_keys,
                         tcolor=tcolor, pending_t=pending_t,
                         pending_s=pending_s)
        t_records = [(rec_t_term, w_t_term), (rec_t_pre, w_t_pre)]
        out = (
            jax.tree.map(lambda *xs: jnp.stack(xs),
                         *[r for r, _ in t_records]),
            jnp.stack([w for _, w in t_records]),
            jax.tree.map(lambda *xs: jnp.stack(xs),
                         *[r for r, _ in s_records]),
            jnp.stack([w for _, w in s_records]),
        )
        return (new_ts, key), out

    (ts, _), (roll_t, w_t, roll_s, w_s) = jax.lax.scan(
        slot, (ts, key), None, length=num_steps)

    # (T, R, N, ...) -> (T*R, N, ...) chronological streams.
    def flat(tree):
        return jax.tree.map(
            lambda x: x.reshape((-1,) + x.shape[3:]) if x.ndim > 2
            else x.reshape(-1, x.shape[-1]), tree)

    roll_t = jax.tree.map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]),
        roll_t)
    roll_s = jax.tree.map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]),
        roll_s)
    w_t = w_t.reshape(-1, N).astype(jnp.float32)
    w_s = w_s.reshape(-1, N).astype(jnp.float32)
    boot_t = ts.pending_t.value * ts.pending_t.valid
    boot_s = ts.pending_s.value * ts.pending_s.valid
    return ts, (roll_t, w_t, boot_t), (roll_s, w_s, boot_s)


class TeacherStudentTrainer:
    """``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — the
    game batch, both roles' pending records and every (R*T, N) rollout
    stream shard over 'data' while both param sets replicate; the two PPO
    updates' gradients all-reduce over ICI (one GSPMD program, matching
    the sharded self-play step in parallel/dp.py).  1-vs-8-device parity:
    tests/test_sharded_trainers.py."""

    def __init__(self, env_cfg: EnvConfig = None,
                 ppo_cfg: PPOConfig = None,
                 run_cfg: TeacherStudentConfig = None, log_fn=None,
                 mesh=None):
        self.mesh = mesh
        self.env_cfg = env_cfg or EnvConfig(num_disk_as_reward=True)
        # Reference overrides: lr 5e-6, clip 0.1, 4 minibatches
        # (ppo_run_teacher_vs_student.py:64-74).
        self.ppo_cfg = ppo_cfg or PPOConfig(lr=5e-6)
        self.run_cfg = run_cfg or TeacherStudentConfig()
        self.log_fn = log_fn

        self.net = make_network(self.env_cfg,
                                hidden_size=self.run_cfg.hidden_size,
                                width_mult=self.run_cfg.width_mult)
        self.apply_fn = make_apply_fn(self.net)
        self.optimizer = make_optimizer(self.ppo_cfg)

        self.key = jax.random.PRNGKey(self.run_cfg.seed)
        self.key, k1, k2 = jax.random.split(self.key, 3)
        dummy = jnp.zeros((1, 4, self.env_cfg.board_size,
                           self.env_cfg.board_size))
        self.params_t = self.net.init(k1, dummy)
        self.params_s = self.net.init(k2, dummy)
        self.opt_t = self.optimizer.init(self.params_t)
        self.opt_s = self.optimizer.init(self.params_s)
        self.ts_state = None
        self.chunk_count = 0
        self.win_avg = {"rand": 0.0, "greedy": 0.0}
        self.last_win_avg = {"rand": 0.0, "greedy": 0.0}

        env_cfg_, ppo_cfg_, run_cfg_ = (self.env_cfg, self.ppo_cfg,
                                        self.run_cfg)
        apply_fn, optimizer = self.apply_fn, self.optimizer

        mesh = self.mesh
        if mesh is not None:
            from gymothelloenv_tpu.parallel.sharding import (
                constrain_batch, constrain_batch_axes)
        N_ = self.run_cfg.num_envs

        def train_step(params_t, params_s, opt_t, opt_s, ts_state,
                       teacher_reward, key):
            if mesh is not None:
                ts_state = constrain_batch_axes(ts_state, mesh, (N_,))
            key, k_c, k_t, k_s = jax.random.split(key, 4)
            ts_state, (roll_t, w_t, boot_t), (roll_s, w_s, boot_s) = \
                collect_ts_rollout(params_t, params_s, apply_fn, ts_state,
                                   env_cfg_, run_cfg_.num_steps,
                                   run_cfg_.init_rand_steps,
                                   teacher_reward, k_c)
            if mesh is not None:
                roll_t, w_t = constrain_batch(
                    (roll_t, w_t), mesh, axis=1, batch_size=N_)
                roll_s, w_s = constrain_batch(
                    (roll_s, w_s), mesh, axis=1, batch_size=N_)
                boot_t, boot_s = constrain_batch(
                    (boot_t, boot_s), mesh, axis=0, batch_size=N_)
            metrics = {}
            if run_cfg_.train_teacher:
                params_t, opt_t, m_t = ppo_update(
                    params_t, opt_t, roll_t, boot_t, k_t, apply_fn,
                    optimizer, ppo_cfg_, weights=w_t)
                metrics.update({f"teacher_{k}": v for k, v in m_t.items()})
            params_s, opt_s, m_s = ppo_update(
                params_s, opt_s, roll_s, boot_s, k_s, apply_fn, optimizer,
                ppo_cfg_, weights=w_s)
            metrics.update({f"student_{k}": v for k, v in m_s.items()})
            episodes = (roll_s.done & (w_s > 0)).sum()
            metrics["student_episode_return"] = (
                (roll_s.reward * w_s).sum() / jnp.maximum(episodes, 1))
            metrics["episodes"] = episodes
            return params_t, params_s, opt_t, opt_s, ts_state, metrics

        self._train_step = jax.jit(train_step,
                                   donate_argnums=(0, 1, 2, 3, 4))

        def eval_step(params, key):
            net_act = net_tournament_policy(params, apply_fn)
            n = run_cfg_.num_test_games // 2
            results = {}
            for name, opp in (("rand", random_policy),
                              ("greedy", greedy_policy)):
                key, ka, kb = jax.random.split(key, 3)
                b = play_games_impl(ka, env_cfg_, net_act, opp, n,
                                    run_cfg_.test_init_rand_steps)
                w = play_games_impl(kb, env_cfg_, opp, net_act, n,
                                    run_cfg_.test_init_rand_steps)
                results[name] = ((b == -1).sum() + (w == 1).sum()) / (2 * n)
            return results

        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    @property
    def teacher_reward(self) -> float:
        """sum_k (win_avg[k] - last_win_avg[k]) — the student-improvement
        signal paid to the teacher at episode end (worker :456-467)."""
        return sum(self.win_avg[k] - self.last_win_avg[k]
                   for k in self.win_avg)

    def ensure_initialized(self):
        if self.ts_state is None:
            self.key, k = jax.random.split(self.key)
            self.ts_state = jax.jit(
                ts_init, static_argnames=("cfg", "num_envs",
                                          "init_rand_steps"))(
                k, cfg=self.env_cfg, num_envs=self.run_cfg.num_envs,
                init_rand_steps=self.run_cfg.init_rand_steps)
            if self.mesh is not None:
                from gymothelloenv_tpu.parallel.sharding import (
                    place_replicated, shard_batch_axes)
                self.ts_state = jax.device_put(
                    self.ts_state,
                    shard_batch_axes(self.mesh, self.ts_state,
                                     (self.run_cfg.num_envs,)))
                (self.params_t, self.params_s, self.opt_t,
                 self.opt_s) = place_replicated(
                    (self.params_t, self.params_s, self.opt_t,
                     self.opt_s), self.mesh)

    def train(self, num_chunks: int, log_every: int = 10,
              checkpoint_path: str = None):
        self.ensure_initialized()
        for c in range(num_chunks):
            self.key, k = jax.random.split(self.key)
            (self.params_t, self.params_s, self.opt_t, self.opt_s,
             self.ts_state, metrics) = self._train_step(
                self.params_t, self.params_s, self.opt_t, self.opt_s,
                self.ts_state, jnp.float32(self.teacher_reward), k)
            self.chunk_count += 1
            if (c + 1) % log_every == 0 or c == num_chunks - 1:
                m = {k_: fetch_scalar(v) for k_, v in metrics.items()}
                m["teacher_reward_signal"] = self.teacher_reward
                self._log(self.chunk_count, m)
            if self.chunk_count % self.run_cfg.test_interval == 0:
                self.key, k = jax.random.split(self.key)
                wins = {k_: fetch_scalar(v) for k_, v in
                        self._eval_step(self.params_s, k).items()}
                self.last_win_avg = dict(self.win_avg)
                self.win_avg = wins
                self._log(self.chunk_count,
                          {f"win avg({k_})": v for k_, v in wins.items()})
            if self.chunk_count % self.run_cfg.teacher_test_interval == 0:
                self.key, k = jax.random.split(self.key)
                wins = {k_: fetch_scalar(v) for k_, v in
                        self._eval_step(self.params_t, k).items()}
                self._log(self.chunk_count,
                          {f"win avg teacher({k_})": v
                           for k_, v in wins.items()})
            if checkpoint_path and \
                    self.chunk_count % self.run_cfg.save_interval == 0:
                self.save(checkpoint_path.format(step=self.chunk_count))
        if checkpoint_path:
            self.save(checkpoint_path.format(step=self.chunk_count))

    def evaluate_student(self):
        self.key, k = jax.random.split(self.key)
        return {k_: fetch_scalar(v)
                for k_, v in self._eval_step(self.params_s, k).items()}

    def load_teacher(self, path: str):
        """Warm-start the teacher from a self-play checkpoint
        (ppo_run_teacher_vs_student.py:60, :120-121)."""
        _, self.params_t, _, _ = load_checkpoint(path, self.params_t)

    def save(self, path: str):
        save_checkpoint(path + ".teacher", self.chunk_count,
                        self.params_t, self.opt_t)
        save_checkpoint(path + ".student", self.chunk_count,
                        self.params_s, self.opt_s)

    def load(self, path: str):
        step, self.params_t, self.opt_t, _ = load_checkpoint(
            path + ".teacher", self.params_t, self.opt_t)
        step, self.params_s, self.opt_s, _ = load_checkpoint(
            path + ".student", self.params_s, self.opt_s)
        self.chunk_count = step

    def _log(self, step, metrics):
        if self.log_fn:
            self.log_fn(step, metrics)
        else:
            text = " ".join(f"{k}={v:.4g}" for k, v in metrics.items())
            print(f"[chunk {step}] {text}", flush=True)
