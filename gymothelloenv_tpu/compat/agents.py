"""Reference-API learned-agent classes: ``PPO`` (ppo.py:111-334) and
``DQNAgent`` (dqn.py:135-503) with the duck-typed driver protocol —
``reset(env)``, ``get_action(state)``, ``get_test_action(state)``,
``run(s, a, r, done, s')``, ``save``/``load``.

These are the single-env host-loop paths for drop-in compatibility with
reference driver scripts (run.py / run_2agent.py / run_self_play.py).  For
throughput, use the batched trainers (train/ppo_trainer.py,
train/simple_ppo_trainer.py, train/dqn_trainer.py) — the compute per
decision is identical, but these classes pay a host round-trip per move.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.agents.dqn import (DQNConfig, dqn_init,
                                          dqn_train_batch, epsilon_at,
                                          make_dqn_net, make_dqn_optimizer,
                                          maybe_sync_target)
from gymothelloenv_tpu.agents.ppo import Transition
from gymothelloenv_tpu.agents.replay import (ReplayConfig, replay_init,
                                             replay_insert)
from gymothelloenv_tpu.agents.simple_ppo import (SimplePPOConfig,
                                                 make_simple_ppo_optimizer,
                                                 simple_ppo_update)
from gymothelloenv_tpu.models.nets import ActorCriticNet
from gymothelloenv_tpu.utils.checkpoint import (load_checkpoint,
                                                save_checkpoint)


def _unwrap(env):
    return env.env if hasattr(env, "env") else env


class PPO:
    """Standalone PPO agent with the reference protocol (ppo.py:111-334)."""

    def __init__(self, agent_name="ppo", board_size=8, state_channels=4,
                 lr=0.001, betas=(0.9, 0.999), gamma=0.99, K_epochs=5,
                 eps_clip=0.2, update_timestep=2000, batch_size=256,
                 random_seed=0):
        self.agent_name = agent_name
        self.board_size = board_size
        self.num_action = board_size ** 2
        self.cfg = SimplePPOConfig(
            lr=lr, betas=betas, gamma=gamma, k_epochs=K_epochs,
            eps_clip=eps_clip, update_timestep=update_timestep,
            batch_size=batch_size)
        self.env = None

        net = ActorCriticNet(num_actions=self.num_action)

        def apply_fn(params, obs):
            logits, value = net.apply(params, obs)
            return logits, value, None

        self._apply_fn = apply_fn
        self._forward = jax.jit(lambda p, x: apply_fn(p, x)[:2])
        self.optimizer = make_simple_ppo_optimizer(self.cfg)
        key = jax.random.PRNGKey(random_seed)
        self.params = net.init(
            key, jnp.zeros((1, state_channels, board_size, board_size)))
        self.opt_state = self.optimizer.init(self.params)
        self._update = jax.jit(functools.partial(
            simple_ppo_update, apply_fn=apply_fn,
            optimizer=self.optimizer, cfg=self.cfg))

        self.memory = {k: [] for k in
                       ("states", "actions", "logprobs", "rewards",
                        "dones")}
        self.timestep = 0
        self.episode = 0
        self.avg_loss = 0.0
        self.total_reward = 0.0
        self.duration = 0
        self.start = time.time()
        self._key = jax.random.PRNGKey(random_seed + 1)

    def reset(self, env):
        self.env = _unwrap(env)

    # -- acting ---------------------------------------------------------
    def _masked_probs(self, state):
        logits, _ = self._forward(self.params,
                                  jnp.asarray(state, jnp.float32)[None])
        probs = np.asarray(jax.nn.softmax(logits[0]))
        moves = self.env.possible_moves
        p = probs[moves]
        p = p / (p.sum() + 1e-60)
        if p.sum() == 0 or np.isnan(p).any():
            p = np.full(len(moves), 1.0 / len(moves))
        else:
            p = p / p.sum()
        return moves, p

    def get_action(self, state):
        moves, p = self._masked_probs(state)
        return int(np.random.choice(moves, p=p))

    def get_test_action(self, state):
        return self.get_action(state)

    # -- learning -------------------------------------------------------
    def run(self, state, action, reward, done, next_state):
        self.timestep += 1
        self.duration += 1
        self.total_reward += reward
        logits, _ = self._forward(self.params,
                                  jnp.asarray(state, jnp.float32)[None])
        logp = float(jax.nn.log_softmax(logits[0])[int(action)])
        self.memory["states"].append(np.asarray(state, np.float32))
        self.memory["actions"].append(int(action))
        self.memory["logprobs"].append(logp)
        self.memory["rewards"].append(float(reward))
        self.memory["dones"].append(bool(done))

        if self.timestep % self.cfg.update_timestep == 0:
            self.avg_loss = self._do_update()
            for v in self.memory.values():
                v.clear()

        if done:
            elapsed = time.time() - self.start
            text = ("EPISODE: {0:6d} / TOTAL_STEPS: {1:8d} / STEPS: {2:5d}"
                    " / TOTAL_REWARD: {3:3.2f} / AVG_LOSS: {4:.5f} /"
                    " STEPS_PER_SECOND: {5:.1f}").format(
                self.episode + 1, self.timestep, self.duration,
                self.total_reward, self.avg_loss,
                self.duration / max(elapsed, 1e-9))
            print(text)
            with open(self.agent_name + "_output.txt", "a") as f:
                f.write(text + "\n")
            self.total_reward = 0.0
            self.duration = 0
            self.start = time.time()
            self.episode += 1

    def _do_update(self):
        T = len(self.memory["actions"])
        roll = Transition(
            obs=jnp.asarray(np.stack(self.memory["states"]))[:, None],
            action=jnp.asarray(self.memory["actions"],
                               jnp.int32)[:, None],
            logp=jnp.asarray(self.memory["logprobs"],
                             jnp.float32)[:, None],
            value=jnp.zeros((T, 1)),
            reward=jnp.asarray(self.memory["rewards"],
                               jnp.float32)[:, None],
            done=jnp.asarray(self.memory["dones"], bool)[:, None],
            legal=jnp.ones((T, 1, self.num_action), bool))
        self._key, k = jax.random.split(self._key)
        self.params, self.opt_state, loss = self._update(
            self.params, self.opt_state, roll, k)
        return float(loss)

    def save(self, path, episode=0, loss=0.0):
        save_checkpoint(path, episode, self.params, self.opt_state,
                        extra={"loss": float(loss)})

    def load(self, checkpoint_or_path):
        if isinstance(checkpoint_or_path, str):
            ep, self.params, self.opt_state, extra = load_checkpoint(
                checkpoint_or_path, self.params, self.opt_state)
            return ep, extra.get("loss", 0.0)
        raise TypeError("pass a checkpoint path")


class DQNAgent:
    """DQN agent with the reference protocol (dqn.py:135-503)."""

    def __init__(self, agent_name="dqn", board_size=8, state_length=3,
                 anealing_steps=1_000_000, initial_epsilon=1.0,
                 final_epsilon=0.1, target_update_interval=10_000,
                 train_interval=4, batch_size=32, lr=0.00025,
                 replay_memory_size=1_000_000, initial_replay_size=20_000,
                 gamma=0.99, n_step=1, prioritized=False, double=False,
                 dueling=False, seed=0):
        self.agent_name = agent_name
        self.env = None
        self.cfg = DQNConfig(
            board_size=board_size, state_channels=state_length,
            gamma=gamma, n_step=n_step, double=double, dueling=dueling,
            lr=lr, batch_size=batch_size,
            initial_epsilon=initial_epsilon, final_epsilon=final_epsilon,
            annealing_steps=anealing_steps,
            initial_replay_size=initial_replay_size,
            target_update_interval=target_update_interval,
            train_interval=train_interval)
        self.rb_cfg = ReplayConfig(capacity=replay_memory_size,
                                   board_size=board_size,
                                   prioritized=prioritized)
        key = jax.random.PRNGKey(seed)
        self.state = dqn_init(self.cfg, key)
        self.replay = replay_init(self.rb_cfg)
        net = make_dqn_net(self.cfg)
        self._apply = jax.jit(lambda p, x: net.apply(p, x))
        self.optimizer = make_dqn_optimizer(self.cfg)
        self._train = jax.jit(functools.partial(
            dqn_train_batch, cfg=self.cfg, rb_cfg=self.rb_cfg,
            apply_fn=lambda p, x: net.apply(p, x),
            optimizer=self.optimizer), donate_argnums=(0, 1))
        self._insert = jax.jit(functools.partial(replay_insert,
                                                 cfg=self.rb_cfg),
                               donate_argnums=(0,))
        self._key = jax.random.PRNGKey(seed + 1)

        self.buffer = []        # host-side n-step window (dqn.py:224)
        self.total_loss = 0.0
        self.total_reward = 0.0
        self.duration = 0
        self.episode = 0
        self.start = time.time()

    def reset(self, env):
        self.env = _unwrap(env)

    @property
    def t(self):
        return int(self.state.t)

    @property
    def epsilon(self):
        return float(epsilon_at(self.cfg, self.state.t))

    def _q(self, state):
        x = jnp.asarray(state, jnp.float32)[None]
        return np.asarray(self._apply(self.state.params, x)[0])

    def _pick(self, state, eps):
        moves = self.env.possible_moves
        if np.random.random() < eps:
            return int(moves[np.random.randint(len(moves))])
        q = self._q(state)
        return int(moves[int(np.argmax(q[moves]))])

    def get_action(self, state):
        eps = 1.0 if self.t < self.cfg.initial_replay_size else self.epsilon
        return self._pick(state, eps)

    def get_test_action(self, state):
        return self._pick(state, self.cfg.test_epsilon)

    def run(self, state, action, reward, terminal, next_state):
        """dqn.py:288-403 — n-step buffering + replay + cadenced updates.
        ``state``/``next_state`` may be 3-plane features or raw boards; the
        replay stores (board, turn) reconstructed from the planes."""
        reward = reward * self.cfg.reward_scale
        board, turn = _planes_to_board(state)
        nboard, nturn = _planes_to_board(next_state)
        self.buffer.append((board, turn, int(action), float(reward),
                            nboard, nturn, bool(terminal)))

        def emit(window):
            m = len(window)
            R = sum(window[k][3] * self.cfg.gamma ** k for k in range(m))
            b0, t0, a0 = window[0][:3]
            nb, nt, dn = window[m - 1][4], window[m - 1][5], window[m - 1][6]
            self.replay = self._insert(
                self.replay,
                board=jnp.asarray(b0)[None], turn=jnp.asarray([t0]),
                action=jnp.asarray([a0], jnp.int32),
                reward=jnp.asarray([R], jnp.float32),
                next_board=jnp.asarray(nb)[None],
                next_turn=jnp.asarray([nt]),
                done=jnp.asarray([dn]),
                valid=jnp.asarray([True]))
            self.state = self.state.replace(t=self.state.t + 1)

        if terminal:
            while self.buffer:
                emit(self.buffer)
                self.buffer.pop(0)
        elif len(self.buffer) >= self.cfg.n_step:
            emit(self.buffer[:self.cfg.n_step])
            self.buffer.pop(0)

        t = self.t
        if t >= self.cfg.initial_replay_size:
            if t % self.cfg.train_interval == 0:
                self._key, k = jax.random.split(self._key)
                self.state, self.replay, loss = self._train(
                    self.state, self.replay, key=k)
                self.total_loss += float(loss)
            if t % self.cfg.target_update_interval == 0:
                self.state = maybe_sync_target(self.state, self.cfg,
                                               jnp.bool_(True))

        self.total_reward += reward / self.cfg.reward_scale
        self.duration += 1
        if terminal:
            elapsed = time.time() - self.start
            text = ("EPISODE: {0:6d} / TOTAL_STEPS: {1:8d} / "
                    "STEPS: {2:5d} / EPSILON: {3:.5f} / "
                    "TOTAL_REWARD: {4:3.0f} / AVG_LOSS: {5:.5f} / "
                    "STEPS_PER_SECOND: {6:.1f}").format(
                self.episode + 1, self.t, self.duration, self.epsilon,
                self.total_reward,
                self.total_loss / max(self.duration
                                      / self.cfg.train_interval, 1),
                self.duration / max(elapsed, 1e-9))
            print(text)
            with open(self.agent_name + "_output.txt", "a") as f:
                f.write(text + "\n")
            self.total_reward = 0.0
            self.total_loss = 0.0
            self.duration = 0
            self.episode += 1
            self.start = time.time()

    def save(self, path, episode=0, loss=0.0):
        save_checkpoint(path, episode, self.state.params,
                        self.state.opt_state,
                        extra={"t": self.t, "loss": float(loss)})

    def load(self, path):
        ep, params, opt_state, extra = load_checkpoint(
            path, self.state.params, self.state.opt_state)
        self.state = self.state.replace(
            params=params,
            target_params=jax.tree.map(jnp.copy, params),
            opt_state=opt_state, t=jnp.int32(extra.get("t", 0)))
        return ep, extra.get("loss", 0.0)


def _planes_to_board(state):
    """Recover (board int8, turn int8) from 3/4-plane features
    ([black, white, turn, ...]) or a raw canonical board."""
    s = np.asarray(state)
    if s.ndim == 3:
        board = (s[1] - s[0]).astype(np.int8)     # white=+1, black=-1
        turn = np.int8(1 if s[2].flat[0] >= 0.5 else -1)
        return board, turn
    raise ValueError("expected plane features (C, B, B)")


class Rainbow(DQNAgent):
    """Rainbow agent with the reference protocol — the class the reference
    imports from an absent external package (``from Rainbow.agent import
    Agent as Rainbow``, util.py:6; ``create_policy('rainbow')``
    util.py:42-43).  Noisy nets + C51 on top of the DQN driver loop;
    exploration comes from the parameter noise, so the epsilon schedule is
    pinned to the test epsilon.
    """

    def __init__(self, agent_name="rainbow", board_size=8, device=None,
                 seed=0, **kwargs):
        del device  # reference signature artifact (util.py:43)
        from gymothelloenv_tpu.agents.rainbow import (
            RainbowConfig, make_rainbow_net, make_rainbow_optimizer,
            rainbow_init, rainbow_train_batch, expected_q)
        super().__init__(agent_name=agent_name, board_size=board_size,
                         seed=seed, prioritized=True, n_step=3, **{
                             k: v for k, v in kwargs.items()
                             if k in ("replay_memory_size",
                                      "initial_replay_size",
                                      "target_update_interval",
                                      "train_interval", "batch_size",
                                      "gamma")})
        self.rainbow_cfg = RainbowConfig(
            board_size=board_size, gamma=self.cfg.gamma,
            n_step=self.cfg.n_step,
            initial_replay_size=self.cfg.initial_replay_size,
            target_update_interval=self.cfg.target_update_interval,
            train_interval=self.cfg.train_interval,
            batch_size=self.cfg.batch_size)
        key = jax.random.PRNGKey(seed)
        self.state = rainbow_init(self.rainbow_cfg, key)
        net = make_rainbow_net(self.rainbow_cfg)
        apply_fn = lambda p, x, k=None: net.apply(p, x, k)
        self._expected_q = jax.jit(
            lambda p, x, k: expected_q(apply_fn(p, x, k),
                                       self.rainbow_cfg))
        self.optimizer = make_rainbow_optimizer(self.rainbow_cfg)
        self._train = jax.jit(functools.partial(
            rainbow_train_batch, cfg=self.rainbow_cfg,
            rb_cfg=self.rb_cfg, apply_fn=apply_fn,
            optimizer=self.optimizer), donate_argnums=(0, 1))

    def _q(self, state):
        x = jnp.asarray(state, jnp.float32)[None]
        self._key, k = jax.random.split(self._key)
        return np.asarray(self._expected_q(self.state.params, x, k)[0])

    def get_action(self, state):
        # Noisy-net exploration: always greedy over the (noisy) values.
        return self._pick(state, 0.0)

    def get_test_action(self, state):
        return self._pick(state, 0.0)
