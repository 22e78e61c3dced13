"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymothelloenv_tpu.agents.ppo import PPOConfig, make_optimizer
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.parallel import (make_mesh, make_sharded_train_step,
                                        policy_param_shardings)
from gymothelloenv_tpu.train.ppo_trainer import make_apply_fn, make_network
from gymothelloenv_tpu.train.self_play import selfplay_init


# Function-scoped on purpose: the sharded train step donates its inputs, and
# jax.device_put may alias rather than copy — so each test needs fresh
# params/opt_state pytrees.
@pytest.fixture()
def setup():
    env_cfg = EnvConfig(num_disk_as_reward=True)
    ppo_cfg = PPOConfig(num_updates=10)
    net = make_network(env_cfg)
    apply_fn = make_apply_fn(net)
    optimizer = make_optimizer(ppo_cfg)
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    opt_state = optimizer.init(params)
    return env_cfg, ppo_cfg, apply_fn, optimizer, params, opt_state, key


def _run(mesh, setup, num_envs=16, num_steps=4):
    env_cfg, ppo_cfg, apply_fn, optimizer, params, opt_state, key = setup
    train_step, place_params, place_sp = make_sharded_train_step(
        mesh, apply_fn, optimizer, env_cfg, ppo_cfg, num_steps,
        params_example=params)
    p = place_params(params)
    # train_step donates its inputs; give it copies so the module-scoped
    # fixture pytrees survive across tests.
    o = jax.tree.map(jnp.copy, opt_state)
    sp = selfplay_init(p, apply_fn, key, env_cfg, num_envs)
    sp = place_sp(sp)
    p, o, sp, metrics = train_step(p, o, sp, key)
    return p, metrics


def test_8_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.slow
def test_dp_mesh_train_step(setup):
    mesh = make_mesh(8, model_parallel=1)
    _, metrics = _run(mesh, setup)
    assert np.isfinite(float(metrics["value_loss"]))


@pytest.mark.slow
def test_dp_tp_mesh_train_step(setup):
    mesh = make_mesh(8, model_parallel=2)
    params, metrics = _run(mesh, setup)
    assert np.isfinite(float(metrics["action_loss"]))
    # The wide fc kernel must actually be sharded over 'model'.
    shardings = policy_param_shardings(mesh, params)
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    tp_leaves = [s for path, s in flat
                 if "Dense_0" in "/".join(str(p) for p in path)
                 and "kernel" in str(path[-1])]
    assert tp_leaves and any(s.spec != () and "model" in str(s.spec)
                             for s in tp_leaves)


@pytest.mark.slow
def test_dp_matches_single_device(setup):
    """Gradient math is identical on a 1-device and an 8-device mesh:
    same params in, same params out (up to float tolerance)."""
    env_cfg, ppo_cfg, apply_fn, optimizer, params, opt_state, key = setup
    results = []
    for n in (1, 8):
        mesh = make_mesh(n, model_parallel=1)
        train_step, place_params, place_sp = make_sharded_train_step(
            mesh, apply_fn, optimizer, env_cfg, ppo_cfg, num_steps=4,
            params_example=params)
        # Copies: train_step donates and device_put may alias the originals.
        p = place_params(jax.tree.map(jnp.copy, params))
        sp = selfplay_init(p, apply_fn, key, env_cfg, 16)
        sp = place_sp(sp)
        p, _, _, _ = train_step(p, jax.tree.map(jnp.copy, opt_state), sp,
                                key)
        results.append(jax.device_get(p))
    for a, b in zip(jax.tree.leaves(results[0]),
                    jax.tree.leaves(results[1])):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)
