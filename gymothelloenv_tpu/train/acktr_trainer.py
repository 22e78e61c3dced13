"""ACKTR self-play trainer — the vendored ``--algo acktr`` capability
(main.py:77-87 with ``acktr=True`` + algo/kfac.py) made runnable on
Othello: a tanh-MLP actor-critic over flattened make_state planes
(``MLPBase`` shape, model.py:317-348 — the architecture the vendored
ACKTR actually trains on MuJoCo) updated with the K-FAC natural-gradient
step, driven by the same self-play collector as the other trainers.

The reference's own Othello fork can't run this path (its A2C_ACKTR
calls ``evaluate_actions`` without ``choices``, a2c_acktr.py:38-43);
the masked distribution here has no such limit."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.agents.a2c import A2CConfig, a2c_returns
from gymothelloenv_tpu.agents.kfac import (ACKTRConfig, acktr_init,
                                           acktr_update, mlp_stack_apply)
from gymothelloenv_tpu.core.featurize import make_state
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.policies.scripted import (greedy_policy,
                                                 random_policy)
from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig
from gymothelloenv_tpu.train.self_play import (collect_rollout,
                                               selfplay_init)
from gymothelloenv_tpu.train.tournament import play_games_impl


def make_mlp_apply_fn():
    """Collector-protocol apply over an ``ACKTRAgent``: flatten the plane
    obs, run both towers."""
    def apply_fn(agent, obs):
        flat = obs.astype(jnp.float32).reshape(obs.shape[0], -1)
        logits, _ = mlp_stack_apply(agent.actor, flat)
        values, _ = mlp_stack_apply(agent.critic, flat)
        return logits, values[:, 0], None
    return apply_fn


class ACKTRSelfPlayTrainer:
    def __init__(self, acktr_cfg: ACKTRConfig = None,
                 env_cfg: EnvConfig = None,
                 run_cfg: SelfPlayConfig = None, log_fn=None):
        self.env_cfg = env_cfg or EnvConfig(num_disk_as_reward=True)
        self.acktr_cfg = acktr_cfg or ACKTRConfig()
        self.run_cfg = run_cfg or SelfPlayConfig(num_steps=5)
        self.log_fn = log_fn
        self.apply_fn = make_mlp_apply_fn()

        B = self.env_cfg.board_size
        self.key, k = jax.random.split(
            jax.random.PRNGKey(self.run_cfg.seed))
        self.agent = acktr_init(k, obs_dim=4 * B * B,
                                num_actions=self.env_cfg.num_actions)
        self.update_count = 0
        self.sp_state = None

        env_cfg = self.env_cfg
        run_cfg = self.run_cfg
        acktr_cfg = self.acktr_cfg
        apply_fn = self.apply_fn
        a2c_cfg = A2CConfig(gamma=acktr_cfg.gamma)

        def train_step(agent, sp_state, key):
            sp_state, rollout, bootstrap = collect_rollout(
                agent, apply_fn, sp_state, env_cfg, run_cfg.num_steps,
                run_cfg.init_rand_steps)
            returns = a2c_returns(rollout, bootstrap, a2c_cfg)
            T, N = rollout.reward.shape
            flat = jax.tree.map(
                lambda x: x.reshape((T * N,) + x.shape[2:]), rollout)
            flat = flat.replace(
                obs=flat.obs.astype(jnp.float32).reshape(T * N, -1))
            agent, metrics = acktr_update(agent, flat, returns.reshape(-1),
                                          key, acktr_cfg)
            metrics = dict(metrics)
            metrics["episodes"] = rollout.done.sum()
            return agent, sp_state, metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))

        def eval_step(agent, key):
            def net_act(k, state):
                obs = make_state(state)[None]
                logits, _, _ = apply_fn(agent, obs)
                return MaskedCategorical(
                    logits=logits[0], mask=state.legal).sample(k)

            n = run_cfg.num_test_games // 2
            results = {}
            for name, opp in (("rand", random_policy),
                              ("greedy", greedy_policy)):
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

    def ensure_initialized(self):
        if self.sp_state is None:
            self.key, k = jax.random.split(self.key)
            self.sp_state = jax.jit(
                selfplay_init,
                static_argnames=("apply_fn", "cfg", "num_envs",
                                 "init_rand_steps"))(
                self.agent, apply_fn=self.apply_fn, key=k,
                cfg=self.env_cfg, num_envs=self.run_cfg.num_envs,
                init_rand_steps=self.run_cfg.init_rand_steps)

    def train(self, num_updates: int, log_every: int = 10):
        self.ensure_initialized()
        t0 = time.time()
        for u in range(num_updates):
            self.key, k = jax.random.split(self.key)
            self.agent, self.sp_state, metrics = self._train_step(
                self.agent, self.sp_state, k)
            self.update_count += 1
            if (u + 1) % log_every == 0 or u == num_updates - 1:
                m = {k_: float(v) for k_, v in metrics.items()}
                m["transitions_per_sec"] = (
                    (u + 1) * self.run_cfg.num_steps
                    * self.run_cfg.num_envs / (time.time() - t0))
                self._log(self.update_count, m)
            if self.update_count % self.run_cfg.test_interval == 0:
                self.key, k = jax.random.split(self.key)
                wins = {k_: float(v) for k_, v in
                        self._eval_step(self.agent, k).items()}
                self._log(self.update_count,
                          {f"win%({k_})": v for k_, v in wins.items()})

    def evaluate(self):
        self.key, k = jax.random.split(self.key)
        return {k_: float(v)
                for k_, v in self._eval_step(self.agent, k).items()}

    def _log(self, step, metrics):
        if self.log_fn:
            self.log_fn(step, metrics)
        else:
            text = " ".join(f"{k}={v:.4g}" for k, v in metrics.items())
            print(f"[update {step}] {text}", flush=True)
