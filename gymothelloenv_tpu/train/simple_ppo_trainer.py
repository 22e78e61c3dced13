"""Simple-PPO self-play trainer — rebuild of ``run_self_play.py`` driving
the standalone PPO agent (ppo.py): one shared ActorCritic plays both colors,
learns only the per-episode protagonist color, updates every
~``update_timestep`` transitions with MC returns.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
from flax import serialization

from gymothelloenv_tpu.agents.simple_ppo import (SimplePPOConfig,
                                                 make_simple_ppo_optimizer,
                                                 simple_ppo_update)
from gymothelloenv_tpu.core.featurize import make_state
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.envs.vec_wrappers import (vecnorm_init,
                                                 vecnorm_reward)
from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.models.nets import ActorCriticNet
from gymothelloenv_tpu.policies.scripted import (greedy_policy,
                                                 random_policy)
from gymothelloenv_tpu.train.self_play import (collect_rollout,
                                               selfplay_init)
from gymothelloenv_tpu.train.tournament import play_games_impl
from gymothelloenv_tpu.utils.tpu import fetch_scalar
from gymothelloenv_tpu.utils.checkpoint import (load_checkpoint,
                                                save_checkpoint)


@dataclasses.dataclass(frozen=True)
class SimpleSelfPlayConfig:
    """run_self_play.py:23-43 equivalents."""
    num_envs: int = 64
    num_steps: int = 32            # slots per update; N*T ~ update_timestep
    init_rand_steps: int = 0
    test_init_rand_steps: int = 10
    num_test_games: int = 200
    test_interval: int = 50        # updates (reference: 2500 episodes)
    save_interval: int = 200
    seed: int = 0
    # Live VecNormalize reward filter (envs/vec_wrappers.py — the rebuilt
    # vendored a2c_ppo_acktr/envs.py:185-205 stack, dead in the reference
    # snapshot): scale rewards by the running std of the per-env
    # discounted return before the MC-return update.  Off = parity.
    vecnorm_reward: bool = False


class SimplePPOSelfPlayTrainer:
    def __init__(self, env_cfg: EnvConfig = None,
                 ppo_cfg: SimplePPOConfig = None,
                 run_cfg: SimpleSelfPlayConfig = None, log_fn=None):
        self.env_cfg = env_cfg or EnvConfig(num_disk_as_reward=True)
        self.ppo_cfg = ppo_cfg or SimplePPOConfig()
        self.run_cfg = run_cfg or SimpleSelfPlayConfig()
        self.log_fn = log_fn

        net = ActorCriticNet(num_actions=self.env_cfg.num_actions)
        self.net = net

        def apply_fn(params, obs):
            logits, value = net.apply(params, obs)
            return logits, value, None

        self.apply_fn = apply_fn
        self.optimizer = make_simple_ppo_optimizer(self.ppo_cfg)

        self.key = jax.random.PRNGKey(self.run_cfg.seed)
        self.key, k_init = jax.random.split(self.key)
        dummy = jnp.zeros((1, 4, self.env_cfg.board_size,
                           self.env_cfg.board_size))
        self.params = net.init(k_init, dummy)
        self.opt_state = self.optimizer.init(self.params)
        self.update_count = 0
        self.sp_state = None
        self.vecnorm = vecnorm_init((), self.run_cfg.num_envs,
                                    gamma=self.ppo_cfg.gamma)

        env_cfg_, ppo_cfg_, run_cfg_ = (self.env_cfg, self.ppo_cfg,
                                        self.run_cfg)
        optimizer = self.optimizer

        use_vecnorm = self.run_cfg.vecnorm_reward

        def train_step(params, opt_state, sp_state, vn_state, key):
            sp_state, rollout, _ = collect_rollout(
                params, apply_fn, sp_state, env_cfg_, run_cfg_.num_steps,
                run_cfg_.init_rand_steps, logp_mode="full")
            episodes = rollout.done.sum()
            raw_return = (rollout.reward.sum()
                          / jnp.maximum(episodes, 1))
            if use_vecnorm:
                # Thread the (T, N) reward stream through the live
                # VecNormalize filter in collection order.
                def vn_step(vn, rd):
                    vn, norm_r = vecnorm_reward(vn, rd[0], rd[1])
                    return vn, norm_r

                vn_state, norm_rewards = jax.lax.scan(
                    vn_step, vn_state, (rollout.reward, rollout.done))
                rollout = rollout.replace(reward=norm_rewards)
            params, opt_state, loss = simple_ppo_update(
                params, opt_state, rollout, key, apply_fn, optimizer,
                ppo_cfg_)
            metrics = {
                "loss": loss,
                "episode_return": raw_return,
                "episodes": episodes,
            }
            return params, opt_state, sp_state, vn_state, metrics

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2, 3))

        def eval_step(params, key):
            def net_act(k, state):
                obs = make_state(state)[None]
                logits, _, _ = apply_fn(params, obs)
                return MaskedCategorical(logits=logits[0],
                                         mask=state.legal).sample(k)

            n = run_cfg_.num_test_games // 2
            results = {}
            for name, opp in (("rand", random_policy),
                              ("greedy", greedy_policy)):
                key, k1, k2 = jax.random.split(key, 3)
                b = play_games_impl(k1, env_cfg_, net_act, opp, n,
                                    run_cfg_.test_init_rand_steps)
                w = play_games_impl(k2, env_cfg_, opp, net_act, n,
                                    run_cfg_.test_init_rand_steps)
                results[name] = ((b == -1).sum() + (w == 1).sum()) / (2 * n)
            return results

        self._eval_step = jax.jit(eval_step)

    def ensure_initialized(self):
        if self.sp_state is None:
            self.key, k = jax.random.split(self.key)
            self.sp_state = jax.jit(
                selfplay_init,
                static_argnames=("apply_fn", "cfg", "num_envs",
                                 "init_rand_steps", "logp_mode"))(
                self.params, apply_fn=self.apply_fn, key=k,
                cfg=self.env_cfg, num_envs=self.run_cfg.num_envs,
                init_rand_steps=self.run_cfg.init_rand_steps,
                logp_mode="full")

    def train(self, num_updates: int, log_every: int = 10,
              checkpoint_path: str = None):
        self.ensure_initialized()
        t0 = time.time()
        done_steps = 0
        for u in range(num_updates):
            self.key, k = jax.random.split(self.key)
            (self.params, self.opt_state, self.sp_state, self.vecnorm,
             metrics) = self._train_step(self.params, self.opt_state,
                                         self.sp_state, self.vecnorm, k)
            self.update_count += 1
            done_steps += self.run_cfg.num_envs * self.run_cfg.num_steps
            if (u + 1) % log_every == 0 or u == num_updates - 1:
                m = {k_: fetch_scalar(v) for k_, v in metrics.items()}
                m["transitions_per_sec"] = done_steps / (time.time() - t0)
                self._log(self.update_count, m)
            if self.update_count % self.run_cfg.test_interval == 0:
                self.key, k = jax.random.split(self.key)
                wins = {k_: fetch_scalar(v) for k_, v in
                        self._eval_step(self.params, k).items()}
                self._log(self.update_count,
                          {f"win%({k_})": v for k_, v in wins.items()})
            if checkpoint_path and (
                    self.update_count % self.run_cfg.save_interval == 0):
                self.save(checkpoint_path)
        if checkpoint_path:
            self.save(checkpoint_path)

    def evaluate(self):
        self.key, k = jax.random.split(self.key)
        return {k_: fetch_scalar(v)
                for k_, v in self._eval_step(self.params, k).items()}

    def _log(self, step, metrics):
        if self.log_fn:
            self.log_fn(step, metrics)
        else:
            text = " ".join(f"{k}={v:.4g}" for k, v in metrics.items())
            print(f"[update {step}] {text}", flush=True)

    def save(self, path: str):
        # The live VecNormalize filter is training state: without it a
        # resumed --vecnorm-reward run would restart the running return
        # statistics and see a reward-scale discontinuity.
        extra = {}
        if self.run_cfg.vecnorm_reward:
            extra["vecnorm"] = serialization.to_state_dict(
                jax.device_get(self.vecnorm))
        save_checkpoint(path, self.update_count, self.params,
                        self.opt_state, extra=extra)

    def load(self, path: str):
        step, self.params, self.opt_state, extra = load_checkpoint(
            path, self.params, self.opt_state)
        if extra.get("vecnorm"):
            self.vecnorm = serialization.from_state_dict(
                self.vecnorm, extra["vecnorm"])
        self.update_count = step
