"""Sharded PPO self-play training step.

Layout: game batch (and every (T, N, ...) rollout leaf) sharded over the
``data`` mesh axis; PolicyNet params replicated, or tensor-parallel over
``model`` for the wide fc/head layers.  The whole
collect-rollout -> GAE -> K-epoch-minibatch-update program is one jitted
GSPMD computation — XLA inserts the gradient all-reduces over ICI that the
reference never had (its learner was single-device, SURVEY.md §2.3).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from gymothelloenv_tpu.agents.ppo import PPOConfig, ppo_update
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.parallel.sharding import (constrain_batch,
                                                 policy_param_shardings,
                                                 replicated,
                                                 shard_batch_tree)
from gymothelloenv_tpu.train.self_play import collect_rollout


def make_sharded_train_step(mesh: Mesh, apply_fn, optimizer,
                            env_cfg: EnvConfig, ppo_cfg: PPOConfig,
                            num_steps: int, init_rand_steps: int = 0,
                            params_example=None, donate: bool = True,
                            jit_wrap: bool = True):
    """Returns (train_step, place_params, place_selfplay_state).

    ``train_step(params, opt_state, sp_state, key)`` is jitted with explicit
    shardings; call ``place_*`` once to lay out the initial pytrees.
    """
    param_sh = (policy_param_shardings(mesh, params_example)
                if params_example is not None else replicated(mesh))

    def place_params(params):
        return jax.device_put(params, policy_param_shardings(mesh, params))

    def place_selfplay_state(sp_state):
        n = sp_state.pcolor.shape[0]
        shardings = shard_batch_tree(mesh, sp_state, axis=0, batch_size=n)
        # Scalar leaves (the scan key) replicate.
        return jax.device_put(sp_state, shardings)

    def train_step(params, opt_state, sp_state, key):
        n = sp_state.pcolor.shape[0]
        sp_state = constrain_batch(sp_state, mesh, axis=0, batch_size=n)
        sp_state, rollout, bootstrap = collect_rollout(
            params, apply_fn, sp_state, env_cfg, num_steps,
            init_rand_steps)
        rollout = constrain_batch(rollout, mesh, axis=1,
                                  batch_size=n)        # (T, N, ...)
        params, opt_state, metrics = ppo_update(
            params, opt_state, rollout, bootstrap, key, apply_fn,
            optimizer, ppo_cfg)
        return params, opt_state, sp_state, metrics

    if not jit_wrap:
        # Traceable body, for embedding in a larger jitted program (e.g.
        # a scan over updates — see scripts/bench_scaling.py).
        return train_step, place_params, place_selfplay_state
    jitted = jax.jit(train_step,
                     donate_argnums=(0, 1, 2) if donate else ())
    return jitted, place_params, place_selfplay_state
