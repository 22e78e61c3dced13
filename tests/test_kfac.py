"""KFAC/ACKTR tests."""

import jax
import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.agents.kfac import (ACKTRConfig, acktr_init,
                                           acktr_update, mlp_stack_apply,
                                           mlp_stack_init, zero_perturb)
from gymothelloenv_tpu.agents.ppo import Transition


def test_perturbation_trick_extracts_preactivation_grads():
    key = jax.random.PRNGKey(0)
    params = mlp_stack_init(key, [4, 8, 3])
    x = jax.random.normal(key, (16, 4))

    def loss(pert):
        out, _ = mlp_stack_apply(params, x, pert)
        return (out ** 2).sum()

    g = jax.grad(loss)(zero_perturb(params, 16))
    # Last layer is linear: dL/dz_last = 2 * out.
    out, _ = mlp_stack_apply(params, x)
    np.testing.assert_allclose(np.asarray(g[-1]), 2 * np.asarray(out),
                               rtol=1e-5)
    assert g[0].shape == (16, 8)


def test_acktr_learns_reward_preference():
    obs_dim, A = 12, 16
    key = jax.random.PRNGKey(0)
    agent = acktr_init(key, obs_dim, A)
    cfg = ACKTRConfig(lr=0.1)
    obs = jax.random.normal(key, (128, obs_dim)) * 0.1
    legal = jnp.ones((128, A), bool)

    def p5(agent):
        logits, _ = mlp_stack_apply(agent.actor, obs)
        return float(jax.nn.softmax(logits, -1)[:, 5].mean())

    before = p5(agent)
    upd = jax.jit(lambda ag, r, ret, k: acktr_update(ag, r, ret, k, cfg))
    for i in range(25):
        key, ka, ku = jax.random.split(key, 3)
        action = jax.random.randint(ka, (128,), 0, A)
        returns = (action == 5).astype(jnp.float32)
        roll = Transition(obs=obs, action=action,
                          logp=jnp.zeros(128), value=jnp.zeros(128),
                          reward=returns, done=jnp.ones(128, bool),
                          legal=legal)
        agent, metrics = upd(agent, roll, returns, ku)
        assert np.isfinite(float(metrics["value_loss"]))
    after = p5(agent)
    assert after > before + 0.05, (before, after)


def test_acktr_selfplay_trainer_smoke():
    """ACKTR self-play trainer (--algo acktr capability): updates run,
    metrics finite, actor params move under the K-FAC step."""
    import jax
    import numpy as np
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.acktr_trainer import ACKTRSelfPlayTrainer
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    logs = []
    tr = ACKTRSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=5, num_test_games=4,
                               test_interval=10**9),
        log_fn=lambda step, m: logs.append(m))
    tr.ensure_initialized()
    before = jax.tree.map(np.asarray, tr.agent.actor)
    tr.train(3, log_every=1)
    assert len(logs) == 3
    assert all(np.isfinite(m["value_loss"]) for m in logs)
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(before),
                        jax.tree.leaves(tr.agent.actor)))
    assert moved


# ---------------------------------------------------------------------------
# Conv-KFC (spec-based stacks)
# ---------------------------------------------------------------------------

def test_stack_apply_dense_matches_mlp_stack_apply():
    from gymothelloenv_tpu.agents.kfac import mlp_specs, stack_apply
    key = jax.random.PRNGKey(1)
    params = mlp_stack_init(key, [6, 8, 4])
    x = jax.random.normal(key, (10, 6))
    a, ia = mlp_stack_apply(params, x)
    b, ib = stack_apply(params, mlp_specs([6, 8, 4]), x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for u, v in zip(ia, ib):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v), rtol=1e-6)


def test_conv_stack_matches_lax_conv():
    """The im2col path computes a real convolution: compare against
    lax.conv_general_dilated with the 2-D weight unpacked to OIHW."""
    from gymothelloenv_tpu.agents.kfac import ConvSpec, stack_apply, stack_init
    spec = ConvSpec(h=8, w=8, c_in=4, c_out=5, kernel=3, stride=2, pad=1,
                    act="none")
    key = jax.random.PRNGKey(2)
    params = stack_init(key, (spec,))
    x = jax.random.normal(key, (3, 4, 8, 8))
    out, inputs = stack_apply(params, (spec,), x)

    # patch feature order from conv_general_dilated_patches is (C, kh, kw)
    w_oihw = params[0]["w"].reshape(4, 3, 3, 5).transpose(3, 0, 1, 2)
    ref = jax.lax.conv_general_dilated(
        x, w_oihw, (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    ref = ref + params[0]["b"][None, :, None, None]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    assert inputs[0].shape == (3 * 4 * 4, 3 * 3 * 4)


def test_conv_kfac_1x1_equals_dense_kfac():
    """A 1x1 conv over a 1x1 board IS a dense layer — the whole ACKTR
    update (factors, eigendecomp, preconditioning, momentum) must agree."""
    from gymothelloenv_tpu.agents.kfac import (ACKTRAgent, ConvSpec,
                                               DenseSpec, kfac_init,
                                               mlp_specs)
    key = jax.random.PRNGKey(3)
    A = 4
    dense_agent = acktr_init(key, obs_dim=3, num_actions=A, hidden=6)
    conv_specs = (ConvSpec(1, 1, 3, 6, kernel=1, act="tanh"),
                  DenseSpec(6, 6, act="tanh"),
                  DenseSpec(6, A, act="none", gain=0.01))
    conv_agent = ACKTRAgent(
        actor=dense_agent.actor, critic=dense_agent.critic,
        kfac_actor=kfac_init(dense_agent.actor),
        kfac_critic=kfac_init(dense_agent.critic),
        actor_specs=conv_specs,
        critic_specs=mlp_specs([3, 6, 6, 1]))

    K = 32
    kk = jax.random.PRNGKey(4)
    flat_obs = jax.random.normal(kk, (K, 3))
    action = jax.random.randint(kk, (K,), 0, A)
    returns = jax.random.normal(kk, (K,))
    legal = jnp.ones((K, A), bool)
    cfg = ACKTRConfig(lr=0.05)

    def roll(obs):
        return Transition(obs=obs, action=action, logp=jnp.zeros(K),
                          value=jnp.zeros(K), reward=returns,
                          done=jnp.ones(K, bool), legal=legal)

    ku = jax.random.PRNGKey(5)
    d2, _ = acktr_update(dense_agent, roll(flat_obs), returns, ku, cfg)
    c2, _ = acktr_update(conv_agent, roll(flat_obs.reshape(K, 3, 1, 1)),
                         returns, ku, cfg)
    for a, b in zip(d2.actor, c2.actor):
        np.testing.assert_allclose(np.asarray(a["w"]), np.asarray(b["w"]),
                                   rtol=1e-4, atol=1e-5)


def test_conv_acktr_learns_reward_preference():
    from gymothelloenv_tpu.agents.kfac import acktr_conv_init, stack_apply
    B, A = 8, 16
    key = jax.random.PRNGKey(6)
    agent = acktr_conv_init(key, board_size=B, num_actions=A)
    cfg = ACKTRConfig(lr=0.1)
    obs = jax.random.normal(key, (64, 4, B, B)) * 0.1
    legal = jnp.ones((64, A), bool)

    def p5(agent):
        logits, _ = stack_apply(agent.actor, agent.actor_specs, obs)
        return float(jax.nn.softmax(logits, -1)[:, 5].mean())

    before = p5(agent)
    upd = jax.jit(lambda ag, r, ret, k: acktr_update(ag, r, ret, k, cfg))
    for i in range(20):
        key, ka, ku = jax.random.split(key, 3)
        action = jax.random.randint(ka, (64,), 0, A)
        returns = (action == 5).astype(jnp.float32)
        rollt = Transition(obs=obs, action=action, logp=jnp.zeros(64),
                           value=jnp.zeros(64), reward=returns,
                           done=jnp.ones(64, bool), legal=legal)
        agent, metrics = upd(agent, rollt, returns, ku)
        assert np.isfinite(float(metrics["value_loss"]))
    after = p5(agent)
    assert after > before + 0.05, (before, after)


def test_conv_acktr_selfplay_trainer_smoke():
    """--net conv trainer path: conv towers + KFC factors drive the same
    self-play loop."""
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.acktr_trainer import ACKTRSelfPlayTrainer
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    logs = []
    tr = ACKTRSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=5, num_test_games=4,
                               test_interval=10**9),
        log_fn=lambda step, m: logs.append(m), net="conv")
    tr.ensure_initialized()
    before = jax.tree.map(np.asarray, tr.agent.actor)
    tr.train(2, log_every=1)
    assert all(np.isfinite(m["value_loss"]) for m in logs)
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(before),
                        jax.tree.leaves(tr.agent.actor)))
    assert moved
