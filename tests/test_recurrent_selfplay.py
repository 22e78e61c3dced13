"""End-to-end recurrent (GRU) self-play: collector hidden-state threading
and its exactness contract with ``ppo_update_recurrent``.

The decisive invariant: with UNCHANGED params, replaying the GRU over the
collected rollout from ``h0`` with the episode masks must reproduce the
behaviour log-probs stored at collection time exactly — that is the
premise the recurrent PPO ratio ``exp(logp_new - logp_old) == 1`` at
epoch 0 rests on (storage.py:159-216 semantics, NNBase._forward_gru
model.py:230-285).
"""

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.agents.ppo import PPOConfig
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                 SelfPlayConfig,
                                                 make_apply_fn_recurrent,
                                                 make_network)
from gymothelloenv_tpu.train.self_play import (collect_rollout_recurrent,
                                               selfplay_init_recurrent)

import pytest

pytestmark = pytest.mark.slow

HIDDEN = 32
N = 12


def _setup():
    env_cfg = EnvConfig(num_disk_as_reward=True)
    net = make_network(env_cfg, recurrent=True, hidden_size=HIDDEN)
    apply_fn = make_apply_fn_recurrent(net)
    key = jax.random.PRNGKey(0)
    dummy = jnp.zeros((1, 4, 8, 8))
    params = net.init(key, dummy, jnp.zeros((1, HIDDEN)), jnp.ones((1,)))
    return env_cfg, apply_fn, params


def _replay_logp(params, apply_fn, rollout, h0, masks):
    def step(h, inp):
        obs_t, mask_t = inp
        logits_t, value_t, h = apply_fn(params, obs_t.astype(jnp.float32),
                                        h, mask_t)
        return h, (logits_t, value_t)

    _, (logits, values) = jax.lax.scan(step, h0, (rollout.obs, masks))
    T, n = rollout.action.shape
    logp = MaskedCategorical(
        logits=logits.reshape(T * n, -1),
        mask=rollout.legal.reshape(T * n, -1)).log_prob(
        rollout.action.reshape(-1))
    return logp.reshape(T, n), values


def test_recurrent_collect_replay_exact():
    env_cfg, apply_fn, params = _setup()

    @jax.jit
    def run(params, key):
        sp = selfplay_init_recurrent(params, apply_fn, key, env_cfg, N,
                                     HIDDEN, init_rand_steps=4)
        # Two chunks: the second starts from a carried pending/hidden,
        # exercising the h0-across-chunks contract.
        sp, _, _, _, _ = collect_rollout_recurrent(
            params, apply_fn, sp, env_cfg, 8, init_rand_steps=4)
        sp, rollout, h0, masks, boot = collect_rollout_recurrent(
            params, apply_fn, sp, env_cfg, 34, init_rand_steps=4)
        return rollout, h0, masks, boot

    rollout, h0, masks, boot = run(params, jax.random.PRNGKey(42))
    assert int(rollout.done.sum()) > 0, "no episode ended; masks untested"
    assert masks.shape == rollout.reward.shape
    np.testing.assert_array_equal(np.asarray(masks[0]), 1.0)
    np.testing.assert_array_equal(
        np.asarray(masks[1:]),
        1.0 - np.asarray(rollout.done[:-1], np.float32))

    logp, values = jax.jit(_replay_logp, static_argnums=1)(
        params, apply_fn, rollout, h0, masks)
    np.testing.assert_allclose(np.asarray(logp), np.asarray(rollout.logp),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(values),
                               np.asarray(rollout.value),
                               rtol=1e-5, atol=1e-5)


def test_recurrent_trainer_end_to_end():
    run_cfg = SelfPlayConfig(num_envs=8, num_steps=6, recurrent=True,
                             hidden_size=HIDDEN, num_test_games=4,
                             test_interval=10_000)
    ppo_cfg = PPOConfig(ppo_epochs=2, num_mini_batch=2, num_updates=2)
    tr = PPOSelfPlayTrainer(env_cfg=EnvConfig(num_disk_as_reward=True),
                            ppo_cfg=ppo_cfg, run_cfg=run_cfg,
                            log_fn=lambda *a: None)
    before = jax.tree.leaves(tr.params)[0].copy()
    tr.train(2, log_every=100)
    after = jax.tree.leaves(tr.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    wins = tr.evaluate()
    assert set(wins) == {"rand", "greedy"}
    assert all(0.0 <= v <= 1.0 for v in wins.values())


def test_recurrent_rejected_outside_ppo():
    import pytest

    from gymothelloenv_tpu.train.a2c_trainer import A2CSelfPlayTrainer
    with pytest.raises(ValueError, match="PPO-only"):
        A2CSelfPlayTrainer(run_cfg=SelfPlayConfig(num_envs=8,
                                                  recurrent=True))


def test_recurrent_update_split_matches_monolithic():
    """The batched-trunk fast path (split_fns) computes the same update
    as the original whole-net-in-scan replay — identical math, different
    batching (VERDICT r2 item 5)."""
    from gymothelloenv_tpu.agents.ppo import (make_optimizer,
                                              ppo_update_recurrent)
    from gymothelloenv_tpu.train.ppo_trainer import (
        make_apply_fn_recurrent, make_network, make_split_fns)
    from gymothelloenv_tpu.train.self_play import selfplay_init_recurrent

    cfg = EnvConfig(num_disk_as_reward=True)
    ppo_cfg = PPOConfig(ppo_epochs=2, num_mini_batch=2, num_updates=4)
    H, N, T = 64, 8, 6
    net = make_network(cfg, recurrent=True, hidden_size=H)
    apply_fn = make_apply_fn_recurrent(net)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)),
                      jnp.zeros((1, H)), jnp.ones((1,)))
    optimizer = make_optimizer(ppo_cfg)
    opt_state = optimizer.init(params)

    sp = jax.jit(selfplay_init_recurrent,
                 static_argnames=("apply_fn", "cfg", "num_envs",
                                  "hidden_size"))(
        params, apply_fn=apply_fn, key=jax.random.PRNGKey(1), cfg=cfg,
        num_envs=N, hidden_size=H)
    sp, rollout, h0, masks, bootstrap = jax.jit(
        collect_rollout_recurrent,
        static_argnames=("apply_fn", "cfg", "num_steps"))(
        params, apply_fn=apply_fn, sp=sp, cfg=cfg, num_steps=T)

    key = jax.random.PRNGKey(7)
    p_mono, _, m_mono = jax.jit(
        ppo_update_recurrent,
        static_argnames=("apply_fn", "optimizer", "cfg"))(
        params, opt_state, rollout, h0, masks, bootstrap, key,
        apply_fn=apply_fn, optimizer=optimizer, cfg=ppo_cfg)
    p_split, _, m_split = jax.jit(
        ppo_update_recurrent,
        static_argnames=("apply_fn", "optimizer", "cfg", "split_fns"))(
        params, opt_state, rollout, h0, masks, bootstrap, key,
        apply_fn=apply_fn, optimizer=optimizer, cfg=ppo_cfg,
        split_fns=make_split_fns(net))

    for a, b in zip(jax.tree.leaves(p_mono), jax.tree.leaves(p_split)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(float(m_mono["value_loss"]),
                               float(m_split["value_loss"]), rtol=1e-4)
