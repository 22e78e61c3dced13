"""GAIL-PPO trainer — the vendored ``main.py`` GAIL wiring (main.py:141-162)
made to work: per update, K discriminator steps on (expert, policy)
state-action batches, then every rollout reward is RELABELED with the
discriminator's ``log s - log(1-s)`` signal (return-std normalized) before
the usual GAE + PPO update.  Dead in the reference (the empty baselines
submodule kills gail.py's imports); working here.

Self-play collection provides the policy occupancy samples; the expert is
an ``ExpertDataset`` npz/h5 (scripts/make_expert_dataset.py generates one
from a scripted expert, e.g. maximin-2).  Discriminator inputs are
``[flattened make_state planes, one-hot action]`` pairs (gail.py:12-28
concatenates state and action the same way).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.agents.gail import (ExpertDataset, GAILConfig,
                                           gail_discriminator_update,
                                           gail_init, gail_predict_reward)
from gymothelloenv_tpu.agents.ppo import ppo_update
from gymothelloenv_tpu.train.ppo_trainer import PPOSelfPlayTrainer
from gymothelloenv_tpu.train.self_play import collect_rollout


@dataclasses.dataclass(frozen=True)
class GAILRunConfig:
    gail_epoch: int = 5            # discriminator steps per update
    #                                (arguments.py --gail-epoch default)
    gail_batch_size: int = 128     # args.gail_batch_size
    num_trajectories: int = 4      # ExpertDataset defaults (gail.py:117)
    subsample_frequency: int = 4   # reference default 20 is for 1000-step
    #                                MuJoCo episodes; Othello games are
    #                                ~60 plies


class GAILPPOTrainer(PPOSelfPlayTrainer):
    """PPO self-play where the environment reward is replaced by the GAIL
    discriminator signal (main.py:141-155)."""

    def __init__(self, expert_path: str, gail_cfg: GAILConfig = None,
                 gail_run: GAILRunConfig = None, **kw):
        super().__init__(**kw)   # mesh= passes through to the base class
        if self.run_cfg.recurrent:
            raise ValueError("recurrent policies are PPO-only (use PPOSelfPlayTrainer)")
        if self.run_cfg.frame_stack > 1 or \
                self.run_cfg.max_episode_plies > 0:
            raise ValueError(
                "frame_stack/max_episode_plies are PPO-only "
                "(this trainer's collector is plain feed-forward)")
        self.gail_run = gail_run or GAILRunConfig()
        self.gail_cfg = gail_cfg or GAILConfig(gamma=self.ppo_cfg.gamma)
        self.expert = ExpertDataset(
            expert_path, num_trajectories=self.gail_run.num_trajectories,
            subsample_frequency=self.gail_run.subsample_frequency)
        self.np_rng = np.random.RandomState(self.run_cfg.seed)

        B = self.env_cfg.board_size
        A = self.env_cfg.num_actions
        self._sa_dim = 4 * B * B + A
        self.key, k = jax.random.split(self.key)
        self.gail_state = gail_init(self.gail_cfg, self._sa_dim,
                                    self.run_cfg.num_envs, k)
        self._eye = np.eye(A, dtype=np.float32)

        env_cfg = self.env_cfg
        ppo_cfg = self.ppo_cfg
        run_cfg = self.run_cfg
        gail_cfg = self.gail_cfg
        apply_fn = self.apply_fn
        optimizer = self.optimizer
        mesh = self.mesh
        N_ = self.run_cfg.num_envs
        if mesh is not None:
            from gymothelloenv_tpu.parallel.sharding import (
                constrain_batch, constrain_batch_axes)

        def gail_train_step(params, opt_state, gail_state, sp_state,
                            last_done, expert_sa, key):
            """expert_sa: (gail_epoch, M, sa_dim) pre-sampled host
            batches; ``last_done`` (N,) bool — whether each env's episode
            ended on the PREVIOUS chunk's final slot (resets the
            discounted-return accumulator across chunk boundaries)."""
            k_disc, k_ppo = jax.random.split(key)
            if mesh is not None:
                sp_state = constrain_batch_axes(sp_state, mesh, (N_,))
            sp_state, rollout, bootstrap = collect_rollout(
                params, apply_fn, sp_state, env_cfg, run_cfg.num_steps,
                run_cfg.init_rand_steps)
            if mesh is not None:
                rollout = constrain_batch(rollout, mesh, axis=1,
                                          batch_size=N_)
                bootstrap = constrain_batch(bootstrap, mesh, axis=0,
                                            batch_size=N_)
            T, N = rollout.reward.shape
            obs_flat = rollout.obs.astype(jnp.float32).reshape(T * N, -1)
            onehot = jax.nn.one_hot(rollout.action.reshape(-1),
                                    env_cfg.num_actions)
            policy_sa = jnp.concatenate([obs_flat, onehot], axis=-1)
            M = expert_sa.shape[1]

            def disc_step(gail_state, inp):
                # Policy minibatches are drawn WITH replacement (uniform
                # over the T*N rollout rows) — a documented divergence
                # from the vendored DataLoader's without-replacement
                # pass; immaterial while T*N >> gail_epoch*M.
                e_sa, k = inp
                k_idx, k_gp = jax.random.split(k)
                idx = jax.random.randint(k_idx, (M,), 0, T * N)
                gail_state, dloss = gail_discriminator_update(
                    gail_state, gail_cfg, e_sa, policy_sa[idx], k_gp)
                return gail_state, dloss

            gail_state, dlosses = jax.lax.scan(
                disc_step, gail_state,
                (expert_sa,
                 jax.random.split(k_disc, expert_sa.shape[0])))

            # Reward relabel, sequential over T to keep the running-return
            # RMS semantics (main.py:150-155 relabels step by step).
            # masks[t] = 1 - done[t-1], carried ACROSS chunk boundaries via
            # last_done so the return accumulator resets when an episode
            # ended on the previous chunk's final slot.
            masks = jnp.concatenate(
                [1.0 - last_done.astype(jnp.float32)[None],
                 1.0 - rollout.done[:-1].astype(jnp.float32)])
            sa_t = policy_sa.reshape(T, N, -1)

            def relabel(gail_state, inp):
                sa, m = inp
                gail_state, r = gail_predict_reward(gail_state, gail_cfg,
                                                    sa, m)
                return gail_state, r

            gail_state, rewards = jax.lax.scan(relabel, gail_state,
                                               (sa_t, masks))
            rollout = rollout.replace(reward=rewards)

            params, opt_state, metrics = ppo_update(
                params, opt_state, rollout, bootstrap, k_ppo, apply_fn,
                optimizer, ppo_cfg)
            metrics = dict(metrics)
            metrics["disc_loss"] = dlosses.mean()
            metrics["gail_reward"] = rewards.mean()
            metrics["episodes"] = rollout.done.sum()
            return (params, opt_state, gail_state, sp_state,
                    rollout.done[-1], metrics)

        # chain_updates: the base train() loop strides by the chain
        # length, so the step must actually run that many updates.  The
        # generic chain_train_steps wrapper doesn't fit here — every
        # chained step needs its OWN host-sampled expert stack — so the
        # scan also consumes a leading (chain, ...) expert axis.  Note
        # the host-side sampling cost and the device transfer both scale
        # linearly in chain: each dispatch ships
        # chain * gail_epoch * gail_batch_size expert rows (at the
        # chain=50 throughput recipe and defaults that is 50*5*128 rows
        # of 4*B^2 floats ≈ 32 MB — fine on HBM, but budget for it
        # before raising gail_batch_size and chain together).
        chain = self._chain = max(1, self.run_cfg.chain_updates)
        if chain > 1:
            def chained(params, opt_state, gail_state, sp_state,
                        last_done, expert_sa, key):
                def body(c, inp):
                    e_sa, k = inp
                    out = gail_train_step(*c, e_sa, k)
                    return tuple(out[:-1]), out[-1]

                carry, ms = jax.lax.scan(
                    body,
                    (params, opt_state, gail_state, sp_state, last_done),
                    (expert_sa, jax.random.split(key, chain)))
                return (*carry, jax.tree.map(lambda x: x[-1], ms))

            step = chained
        else:
            step = gail_train_step
        self._gail_train_step = jax.jit(step, donate_argnums=(0, 1, 2, 3))
        self._last_done = jnp.zeros((self.run_cfg.num_envs,), bool)

    def bc_warmstart(self, updates: int, batch_size: int = 512,
                     lr: float = 2.5e-4, log_every: int = 100):
        """Behaviour-cloning pretrain on expert (state, action) pairs
        before adversarial training — the standard GAIL warm-start (the
        vendored repo trains gail_experts BC baselines the same way).
        Minimizes masked cross-entropy of the policy at expert actions
        (legal mask recovered from the stored observation's legal-move
        plane, util.py:48-74 plane 3); the value head and the trainer's
        Adam state are untouched (a dedicated optimizer drives BC)."""
        import optax

        from gymothelloenv_tpu.models.distributions import MaskedCategorical

        B = self.env_cfg.board_size
        apply_fn = self.apply_fn
        bc_opt = optax.adam(lr)
        bc_state = bc_opt.init(self.params)

        @jax.jit
        def bc_step(params, bc_state, s, a, mask, ok):
            # Degenerate rows (terminal-padding states with no legal
            # move) are down-weighted, NOT filtered: a boolean filter
            # would give every batch a data-dependent shape (one jit
            # compile per distinct count) and an all-degenerate batch a
            # NaN mean.  Their mask is replaced by all-legal so the
            # log-prob stays finite before the zero weight.
            safe_mask = jnp.where(ok[:, None], mask, True)

            def loss_fn(params):
                logits, _, _ = apply_fn(params, s)
                lp = MaskedCategorical(logits=logits,
                                       mask=safe_mask).log_prob(a)
                w = ok.astype(lp.dtype)
                return -(lp * w).sum() / jnp.maximum(w.sum(), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, bc_state = bc_opt.update(grads, bc_state, params)
            return optax.apply_updates(params, upd), bc_state, loss

        for i in range(updates):
            s, a = self.expert.sample(self.np_rng, batch_size)
            s = np.asarray(s, np.float32).reshape(-1, 4, B, B)
            a = np.asarray(a, np.int64).reshape(-1)
            mask = s[:, 3].reshape(len(s), -1) > 0.5
            # Valid rows: non-empty legal plane AND the stored action is
            # legal under it (protects against noisy/padded datasets).
            ok = mask.any(axis=1) & mask[np.arange(len(a)), a]
            self.params, bc_state, loss = bc_step(
                self.params, bc_state, jnp.asarray(s),
                jnp.asarray(a), jnp.asarray(mask), jnp.asarray(ok))
            if log_every and ((i + 1) % log_every == 0 or i == 0):
                self._log(i + 1 - updates,   # negative steps = pre-GAIL
                          {"bc_loss": float(loss)})

    def _sample_expert(self) -> np.ndarray:
        """(gail_epoch, M, sa_dim) float32 [state, one-hot action] rows."""
        out = []
        for _ in range(self.gail_run.gail_epoch):
            s, a = self.expert.sample(self.np_rng,
                                      self.gail_run.gail_batch_size)
            s = np.asarray(s, np.float32).reshape(len(s), -1)
            onehot = self._eye[np.asarray(a, np.int64).reshape(-1)]
            out.append(np.concatenate([s, onehot], axis=-1))
        return np.stack(out)

    def _do_update(self, key):
        if self._chain > 1:
            expert_sa = jnp.asarray(np.stack(
                [self._sample_expert() for _ in range(self._chain)]))
        else:
            expert_sa = jnp.asarray(self._sample_expert())
        (self.params, self.opt_state, self.gail_state, self.sp_state,
         self._last_done, metrics) = self._gail_train_step(
            self.params, self.opt_state, self.gail_state, self.sp_state,
            self._last_done, expert_sa, key)
        return metrics
