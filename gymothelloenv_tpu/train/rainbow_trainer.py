"""Batched Rainbow trainer — the working stand-in for the reference's
*absent* external Rainbow package (``from Rainbow.agent import Agent``,
util.py:6; default protagonist of run_self_play.py:293-327, served by
``RainbowEnvs`` envs.py:260-288).

Reuses the DQN collection loop (train/dqn_trainer.py: slot-scan self-play
with pending-pair terminal crediting, n-step FIFO, on-device replay) and
swaps the algorithm hooks:

  * act: greedy over the expected Q of the *noisy* net — exploration comes
    from parameter noise, so epsilon is pinned to 0.
  * update: C51 projected-Bellman KL loss with double-DQN action selection;
    PER priorities are the per-sample KL terms.
  * eval: deterministic mean-weight forward (noise off), pure greedy.

``RainbowConfig`` duck-types the fields the collection loop reads from
``DQNConfig`` (gamma, n_step, train_interval, initial_replay_size,
target_update_interval, reward_scale, batch_size, board_size).
"""

from __future__ import annotations

import jax.numpy as jnp

from gymothelloenv_tpu.agents.dqn import featurize3, greedy_legal_action
from gymothelloenv_tpu.agents.rainbow import (RainbowConfig, expected_q,
                                              make_rainbow_net,
                                              make_rainbow_optimizer,
                                              rainbow_act, rainbow_init,
                                              rainbow_train_batch)
from gymothelloenv_tpu.agents.replay import ReplayConfig
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.dqn_trainer import DQNRunConfig, DQNTrainer


class RainbowTrainer(DQNTrainer):
    def __init__(self, env_cfg: EnvConfig = None,
                 rainbow_cfg: RainbowConfig = None,
                 rb_cfg: ReplayConfig = None,
                 run_cfg: DQNRunConfig = None,
                 log_fn=None, mesh=None):
        env_cfg = env_cfg or EnvConfig(num_disk_as_reward=True)
        rainbow_cfg = rainbow_cfg or RainbowConfig(
            board_size=env_cfg.board_size)
        # Rainbow = PER on by default.
        rb_cfg = rb_cfg or ReplayConfig(board_size=env_cfg.board_size,
                                        prioritized=True)
        super().__init__(env_cfg=env_cfg, dqn_cfg=rainbow_cfg,
                         rb_cfg=rb_cfg, run_cfg=run_cfg, log_fn=log_fn,
                         mesh=mesh)

    # -- algorithm hooks -------------------------------------------------
    def _setup_algo(self):
        net = make_rainbow_net(self.dqn_cfg)
        self.apply_fn = lambda params, x, key=None: net.apply(params, x,
                                                              key)
        self.optimizer = make_rainbow_optimizer(self.dqn_cfg)

    def _init_agent(self, key):
        return rainbow_init(self.dqn_cfg, key)

    def _epsilon(self, t):
        del t  # noisy nets: no epsilon schedule
        return jnp.float32(0.0)

    def _agent_act(self, params, board, turn, legal, key, eps):
        del eps
        return rainbow_act(params, self.apply_fn, board, turn, legal, key,
                           self.dqn_cfg)

    def _agent_train_batch(self, agent, replay, key):
        if self._per_shard:
            return self._agent_train_batch_pershard(agent, replay, key)
        return rainbow_train_batch(agent, replay, self.dqn_cfg,
                                   self.rb_cfg, self.apply_fn,
                                   self.optimizer, key, mesh=self.mesh)

    def _agent_train_batch_pershard(self, agent, stacked, key):
        from gymothelloenv_tpu.parallel.replay_shards import (
            rainbow_train_batch_pershard)
        return rainbow_train_batch_pershard(
            agent, stacked, self.dqn_cfg, self._per_shard_cfg,
            self.apply_fn, self.optimizer, key, self.mesh)

    def _opponent_greedy(self, params, board, turn, legal):
        """Frozen-snapshot opponent: greedy over the mean-weight
        (noise-off) expected Q."""
        log_p = self.apply_fn(params, featurize3(board, turn))
        q = expected_q(log_p, self.dqn_cfg)
        return greedy_legal_action(q, legal)

    def _eval_act(self, params, key, state):
        """Deterministic (mean-weight, noise off) greedy action."""
        del key
        log_p = self.apply_fn(params, featurize3(
            state.board, state.turn)[None])[0]
        q = expected_q(log_p, self.dqn_cfg)
        return greedy_legal_action(q, state.legal)
