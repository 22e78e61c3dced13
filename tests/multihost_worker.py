"""Subprocess worker for tests/test_multihost.py — not a test module.

Each invocation is one "host" of a 2-process jax.distributed cluster
(gloo over localhost, 4 virtual CPU devices per process = 8 global).
Exercises the real multihost path (parallel/multihost.py): cluster
handshake, global pod mesh, host-local -> global batch assembly, a jitted
gradient over the globally-sharded batch, and a FULL sharded PPO
self-play train step (collect + GAE + minibatch epochs) where GSPMD
inserts the cross-process (DCN-role) reductions.

Module-level code stays import-safe: tests/test_multihost.py imports
``ppo_full_step`` to compute the single-process reference value the
2-process cluster must reproduce.
"""


def ppo_full_step(mesh, num_envs: int = 8, num_steps: int = 4) -> float:
    """One full sharded PPO train step on ``mesh``; returns value_loss.

    Inputs are process-replicated (same seeds everywhere); the train step
    itself re-shards via its internal constraints, so the identical
    global program runs on a single-process mesh or a multi-process pod
    mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gymothelloenv_tpu.agents.ppo import PPOConfig, make_optimizer
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.parallel.dp import make_sharded_train_step
    from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                     make_network)
    from gymothelloenv_tpu.train.self_play import selfplay_init

    env_cfg = EnvConfig(num_disk_as_reward=True)
    ppo_cfg = PPOConfig(num_updates=10)
    net = make_network(env_cfg)
    apply_fn = make_apply_fn(net)
    optimizer = make_optimizer(ppo_cfg)

    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    opt_state = optimizer.init(params)
    train_step, _, _ = make_sharded_train_step(
        mesh, apply_fn, optimizer, env_cfg, ppo_cfg, num_steps,
        params_example=params, donate=False)

    sp_state = jax.jit(
        selfplay_init, static_argnames=("apply_fn", "cfg", "num_envs",
                                        "init_rand_steps"))(
        params, apply_fn=apply_fn, key=key, cfg=env_cfg,
        num_envs=num_envs)
    _, _, _, metrics = train_step(params, opt_state, sp_state, key)
    return float(np.asarray(metrics["value_loss"].addressable_data(0)))


def main(pid: int, port: str):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from gymothelloenv_tpu.parallel import multihost

    multihost.initialize(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    mesh = multihost.make_pod_mesh()
    assert mesh.devices.size == 8, mesh

    GLOBAL = 16
    per, off = multihost.host_batch_slice(GLOBAL)
    assert per == 8 and off == pid * 8

    x_local = np.arange(off, off + per, dtype=np.float32)
    x = multihost.assemble_global(mesh, P("data"), x_local)

    # Global reduction over the sharded batch.
    total = jax.jit(jnp.sum)(x)
    got = float(np.asarray(total.addressable_data(0)))
    assert got == sum(range(GLOBAL)), got

    # DP gradient: d/dw mean((x*w)^2) over the GLOBAL batch = 2*mean(x^2)
    # at w=1 — GSPMD inserts the cross-process (DCN-role) reduction.
    w = jnp.ones((1,))

    def loss(w, x):
        return jnp.mean((x * w[0]) ** 2)

    g = jax.jit(jax.grad(loss))(w, x)
    g_val = float(np.asarray(g.addressable_data(0))[0])
    expect = float(2.0 * np.mean(np.arange(GLOBAL, dtype=np.float64) ** 2))
    assert abs(g_val - expect) < 1e-3, (g_val, expect)

    # Full sharded PPO train step across the 2-process cluster.
    value_loss = ppo_full_step(mesh)
    assert np.isfinite(value_loss), value_loss
    print(f"OK proc{pid} sum={got} grad={g_val} "
          f"ppo_value_loss={value_loss:.6f}", flush=True)


if __name__ == "__main__":
    import os
    import sys

    _pid = int(sys.argv[1])
    _port = sys.argv[2]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    main(_pid, _port)
