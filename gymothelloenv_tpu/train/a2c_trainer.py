"""A2C self-play trainer — the vendored ``--algo a2c`` capability
(main.py:77-87 + algo/a2c_acktr.py), a dead path in the reference's
Othello fork (its A2C calls ``evaluate_actions`` without ``choices``,
a2c_acktr.py:38-43), working here with masked actions.

Same self-play collection as the PPO trainer; the update is one
full-batch RMSprop actor-critic step per rollout (reference cadence:
``num_steps=5``, arguments.py defaults)."""

from __future__ import annotations

import jax

from gymothelloenv_tpu.agents.a2c import (A2CConfig, a2c_update,
                                          make_a2c_optimizer)
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                 SelfPlayConfig,
                                                 chain_train_steps)
from gymothelloenv_tpu.train.self_play import collect_rollout


class A2CSelfPlayTrainer(PPOSelfPlayTrainer):
    def __init__(self, a2c_cfg: A2CConfig = None,
                 env_cfg: EnvConfig = None,
                 run_cfg: SelfPlayConfig = None, log_fn=None, mesh=None):
        self.a2c_cfg = a2c_cfg or A2CConfig()
        if run_cfg is None:
            run_cfg = SelfPlayConfig(num_steps=5)   # arguments.py default
        super().__init__(env_cfg=env_cfg, run_cfg=run_cfg, log_fn=log_fn,
                         mesh=mesh)
        if self.run_cfg.recurrent:
            raise ValueError("recurrent policies are PPO-only (use PPOSelfPlayTrainer)")
        if self.run_cfg.frame_stack > 1 or \
                self.run_cfg.max_episode_plies > 0:
            raise ValueError(
                "frame_stack/max_episode_plies are PPO-only "
                "(this trainer's collector is plain feed-forward)")

        # Replace the PPO optimizer/update with the A2C ones.
        self.optimizer = make_a2c_optimizer(self.a2c_cfg)
        self.opt_state = self.optimizer.init(self.params)

        env_cfg_ = self.env_cfg
        run_cfg_ = self.run_cfg
        a2c_cfg_ = self.a2c_cfg
        apply_fn = self.apply_fn
        optimizer = self.optimizer
        N_ = self.run_cfg.num_envs
        if mesh is not None:
            from gymothelloenv_tpu.parallel.sharding import (
                constrain_batch, constrain_batch_axes)

        def train_step(params, opt_state, sp_state, key):
            del key   # A2C has no minibatch shuffle
            if mesh is not None:
                sp_state = constrain_batch_axes(sp_state, mesh, (N_,))
            sp_state, rollout, bootstrap = collect_rollout(
                params, apply_fn, sp_state, env_cfg_, run_cfg_.num_steps,
                run_cfg_.init_rand_steps)
            if mesh is not None:
                rollout = constrain_batch(rollout, mesh, axis=1,
                                          batch_size=N_)
                bootstrap = constrain_batch(bootstrap, mesh, axis=0,
                                            batch_size=N_)
            params, opt_state, metrics = a2c_update(
                params, opt_state, rollout, bootstrap, apply_fn,
                optimizer, a2c_cfg_)
            metrics = dict(metrics)
            metrics["episodes"] = rollout.done.sum()
            return params, opt_state, sp_state, metrics

        # Honor chain_updates here too: the base train() loop strides by
        # the chain length, so a single-update step would silently run
        # 1/chain of the requested updates.
        chain = self.run_cfg.chain_updates
        if chain > 1:
            train_step = chain_train_steps(train_step, chain)
        self._train_step = jax.jit(train_step, donate_argnums=(0, 1, 2))
