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

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.agents.a2c import A2CConfig, a2c_returns
from gymothelloenv_tpu.agents.kfac import (ACKTRConfig, acktr_conv_init,
                                           acktr_init, acktr_update,
                                           mlp_stack_apply, stack_apply)
from gymothelloenv_tpu.core.featurize import make_state
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.policies.scripted import (greedy_policy,
                                                 random_policy)
from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                 SelfPlayConfig,
                                                 chain_train_steps)
from gymothelloenv_tpu.train.self_play import collect_rollout
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


def make_conv_apply_fn():
    """Same protocol over the conv towers (``acktr_conv_init``): obs stay
    (N, 4, B, B) planes."""
    def apply_fn(agent, obs):
        x = obs.astype(jnp.float32)
        logits, _ = stack_apply(agent.actor, agent.actor_specs, x)
        values, _ = stack_apply(agent.critic, agent.critic_specs, x)
        return logits, values[:, 0], None
    return apply_fn


class ACKTRSelfPlayTrainer(PPOSelfPlayTrainer):
    """Reuses the parent train/eval loop; ``self.params`` holds the
    ``ACKTRAgent`` pytree (actor/critic MLP stacks + K-FAC states) and
    ``opt_state`` is unused (K-FAC state lives in the agent)."""

    def __init__(self, acktr_cfg: ACKTRConfig = None,
                 env_cfg: EnvConfig = None,
                 run_cfg: SelfPlayConfig = None, log_fn=None,
                 net: str = "mlp", mesh=None):
        self.acktr_cfg = acktr_cfg or ACKTRConfig()
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

        # Swap in the spec'd agent: the parent's ensure_initialized and
        # eval read self.params/self.apply_fn at call time, so replacing
        # them re-targets the whole loop.  net='conv' uses the
        # CNNBase-shaped towers with KFC conv factors.
        conv = net == "conv"
        self.apply_fn = make_conv_apply_fn() if conv else make_mlp_apply_fn()
        B = self.env_cfg.board_size
        self.key, k = jax.random.split(self.key)
        if conv:
            self.params = acktr_conv_init(
                k, board_size=B, num_actions=self.env_cfg.num_actions)
        else:
            self.params = acktr_init(k, obs_dim=4 * B * B,
                                     num_actions=self.env_cfg.num_actions)
        self.opt_state = ()

        env_cfg = self.env_cfg
        run_cfg = self.run_cfg
        acktr_cfg = self.acktr_cfg
        apply_fn = self.apply_fn
        a2c_cfg = A2CConfig(gamma=acktr_cfg.gamma)

        mesh = self.mesh
        N_ = self.run_cfg.num_envs
        if mesh is not None:
            from gymothelloenv_tpu.parallel.sharding import (
                constrain_batch, constrain_batch_axes)

        def train_step(agent, sp_state, key):
            if mesh is not None:
                sp_state = constrain_batch_axes(sp_state, mesh, (N_,))
            sp_state, rollout, bootstrap = collect_rollout(
                agent, apply_fn, sp_state, env_cfg, run_cfg.num_steps,
                run_cfg.init_rand_steps)
            if mesh is not None:
                # Batch shards over 'data'; K-FAC factor stats reduce
                # across shards via GSPMD, eigendecomps stay replicated.
                rollout = constrain_batch(rollout, mesh, axis=1,
                                          batch_size=N_)
                bootstrap = constrain_batch(bootstrap, mesh, axis=0,
                                            batch_size=N_)
            returns = a2c_returns(rollout, bootstrap, a2c_cfg)
            T, N = rollout.reward.shape
            flat = jax.tree.map(
                lambda x: x.reshape((T * N,) + x.shape[2:]), rollout)
            obs = flat.obs.astype(jnp.float32)
            flat = flat.replace(
                obs=obs if conv else obs.reshape(T * N, -1))
            agent, metrics = acktr_update(agent, flat, returns.reshape(-1),
                                          key, acktr_cfg)
            metrics = dict(metrics)
            metrics["episodes"] = rollout.done.sum()
            return agent, sp_state, metrics

        # Honor chain_updates (the base train() loop strides by it).
        chain = self.run_cfg.chain_updates
        if chain > 1:
            train_step = chain_train_steps(train_step, chain)
        self._acktr_step = jax.jit(train_step, donate_argnums=(0, 1))

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

    def _do_update(self, key):
        self.params, self.sp_state, metrics = self._acktr_step(
            self.params, self.sp_state, key)
        return metrics

    @property
    def agent(self):
        """The ACKTRAgent pytree (alias of ``params``)."""
        return self.params
