"""KFAC/ACKTR tests."""

import jax
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
