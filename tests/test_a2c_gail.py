"""A2C and GAIL module tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.agents.a2c import (A2CConfig, a2c_returns,
                                          a2c_update, make_a2c_optimizer)
from gymothelloenv_tpu.agents.gail import (ExpertDataset, GAILConfig,
                                           gail_discriminator_update,
                                           gail_init, gail_predict_reward)
from gymothelloenv_tpu.agents.ppo import Transition
from gymothelloenv_tpu.models.nets import PolicyNet

import pytest

pytestmark = pytest.mark.slow


def _rollout(T, N, key):
    ks = jax.random.split(key, 4)
    return Transition(
        obs=jax.random.normal(ks[3], (T, N, 4, 8, 8)) * 0.1,
        action=jax.random.randint(ks[0], (T, N), 0, 64),
        logp=jnp.zeros((T, N)),
        value=jax.random.normal(ks[1], (T, N)),
        reward=jax.random.normal(ks[2], (T, N)),
        done=jnp.zeros((T, N), bool).at[5].set(True),
        legal=jnp.ones((T, N, 64), bool))


def test_a2c_returns_bootstrapped():
    cfg = A2CConfig(gamma=0.9, use_gae=False)
    roll = _rollout(8, 2, jax.random.PRNGKey(0))
    boot = jnp.asarray([1.0, -1.0])
    got = np.asarray(a2c_returns(roll, boot, cfg))
    rewards = np.asarray(roll.reward)
    dones = np.asarray(roll.done)
    want = np.zeros((8, 2))
    for j in range(2):
        ret = float(boot[j])
        for t in reversed(range(8)):
            ret = rewards[t, j] + 0.9 * ret * (1 - dones[t, j])
            want[t, j] = ret
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_a2c_update_runs_and_moves_params():
    net = PolicyNet(num_actions=64)

    def apply_fn(p, x):
        return net.apply(p, x)

    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    cfg = A2CConfig()
    opt = make_a2c_optimizer(cfg)
    opt_state = opt.init(params)
    roll = _rollout(8, 4, key)
    new_params, _, metrics = jax.jit(
        lambda p, o, r: a2c_update(p, o, r, jnp.zeros(4), apply_fn, opt,
                                   cfg))(params, opt_state, roll)
    assert np.isfinite(float(metrics["value_loss"]))
    diffs = [float(jnp.abs(a - b).max()) for a, b in
             zip(jax.tree.leaves(params), jax.tree.leaves(new_params))]
    assert max(diffs) > 0


def test_gail_discriminator_learns_to_separate():
    cfg = GAILConfig(hidden_dim=32)
    key = jax.random.PRNGKey(0)
    state = gail_init(cfg, input_dim=8, num_envs=4, key=key)
    rng = np.random.RandomState(0)
    upd = jax.jit(lambda s, e, p, k: gail_discriminator_update(
        s, cfg, e, p, k))
    for i in range(60):
        expert = jnp.asarray(rng.randn(64, 8) + 2.0, jnp.float32)
        policy = jnp.asarray(rng.randn(64, 8) - 2.0, jnp.float32)
        key, k = jax.random.split(key)
        state, loss = upd(state, expert, policy, k)
    # Rewards (log s - log(1-s)) should be higher for expert-like data.
    state, r_expert = gail_predict_reward(
        state, cfg, jnp.ones((4, 8)) * 2.0, jnp.ones(4),
        update_rms=False)
    state, r_policy = gail_predict_reward(
        state, cfg, -jnp.ones((4, 8)) * 2.0, jnp.ones(4),
        update_rms=False)
    assert float(r_expert.mean()) > float(r_policy.mean())


def test_expert_dataset_subsampling(tmp_path):
    K, T, D = 6, 100, 5
    rng = np.random.RandomState(0)
    path = str(tmp_path / "expert.npz")
    np.savez(path, states=rng.randn(K, T, D),
             actions=rng.randint(0, 64, (K, T)),
             lengths=np.full(K, T))
    ds = ExpertDataset(path, num_trajectories=3, subsample_frequency=10)
    assert len(ds) == 3 * (T // 10)
    s, a = ds.sample(rng, 16)
    assert s.shape == (16, D) and a.shape == (16,)


def test_expert_dataset_reads_reference_h5_schema(tmp_path):
    """ExpertDataset consumes the reference's raw h5 trajectory layout
    (obs_B_T_Do/a_B_T_Da/len_B, convert_to_pytorch.py:29-47) directly and
    identically to the converted npz."""
    import pytest
    h5py = pytest.importorskip("h5py")
    from gymothelloenv_tpu.agents.gail import ExpertDataset

    K, T, D = 5, 24, 6
    rng = np.random.RandomState(3)
    states = rng.randn(K, T, D).astype(np.float32)
    actions = rng.randn(K, T, 2).astype(np.float32)
    h5 = str(tmp_path / "trajs.h5")
    with h5py.File(h5, "w") as f:
        f["obs_B_T_Do"] = states
        f["a_B_T_Da"] = actions
        f["r_B_T"] = rng.randn(K, T).astype(np.float32)
        f["len_B"] = np.full(K, T, np.int64)
    npz = str(tmp_path / "trajs.npz")
    np.savez(npz, states=states, actions=actions,
             lengths=np.full(K, T, np.int64))

    ds_h5 = ExpertDataset(h5, num_trajectories=3, subsample_frequency=4)
    ds_npz = ExpertDataset(npz, num_trajectories=3, subsample_frequency=4)
    assert len(ds_h5) == len(ds_npz) > 0
    np.testing.assert_array_equal(ds_h5.states, ds_npz.states)
    np.testing.assert_array_equal(ds_h5.actions, ds_npz.actions)


def test_gail_ppo_trainer_smoke(tmp_path):
    """Full GAIL-PPO wiring (main.py:141-162, dead in the reference): a
    couple of updates on a tiny expert set — discriminator loss finite
    and decreasing in expectation, rewards relabeled, PPO metrics
    finite."""
    import jax
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.gail_trainer import (GAILPPOTrainer,
                                                      GAILRunConfig)
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    # Tiny synthetic expert: random {0,1} plane rows + random actions.
    rng = np.random.RandomState(0)
    K, T = 4, 20
    np.savez(str(tmp_path / "expert.npz"),
             states=(rng.rand(K, T, 256) > 0.7).astype(np.float32),
             actions=rng.randint(0, 64, (K, T)).astype(np.int64),
             lengths=np.full(K, T, np.int64))

    losses = []
    tr = GAILPPOTrainer(
        expert_path=str(tmp_path / "expert.npz"),
        gail_run=GAILRunConfig(gail_epoch=2, gail_batch_size=16,
                               num_trajectories=3,
                               subsample_frequency=2),
        env_cfg=EnvConfig(num_disk_as_reward=True),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=8,
                               num_test_games=4, test_interval=10**9),
        log_fn=lambda step, m: losses.append(m))
    tr.train(2, log_every=1)
    assert len(losses) == 2
    for m in losses:
        assert np.isfinite(m["disc_loss"])
        assert np.isfinite(m["value_loss"])
        assert np.isfinite(m["gail_reward"])


def test_a2c_selfplay_trainer_smoke():
    """A2C self-play trainer (the vendored --algo a2c path, dead in the
    fork): a few updates run, metrics finite, params move."""
    import jax
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.a2c_trainer import A2CSelfPlayTrainer
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    logs = []
    tr = A2CSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=5,
                               num_test_games=4, test_interval=10**9),
        log_fn=lambda step, m: logs.append(m))
    before = jax.tree.map(np.asarray, tr.params)
    tr.train(3, log_every=1)
    assert len(logs) == 3
    assert all(np.isfinite(m["value_loss"]) for m in logs)
    moved = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(before),
                        jax.tree.leaves(tr.params)))
    assert moved


def test_gail_trainer_resets_return_accumulator_at_chunk_boundary(
        tmp_path):
    """The discounted-return accumulator feeding the reward-normalizing
    RMS must reset for envs whose episode ended on the previous chunk's
    LAST slot (masks[0] = 1 - last_done) — regression for the hardcoded
    masks[0]=1 bug."""
    import jax
    import jax.numpy as jnp
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.gail_trainer import (GAILPPOTrainer,
                                                      GAILRunConfig)
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    rng = np.random.RandomState(1)
    K, T = 3, 16
    np.savez(str(tmp_path / "e.npz"),
             states=(rng.rand(K, T, 256) > 0.7).astype(np.float32),
             actions=rng.randint(0, 64, (K, T)).astype(np.int64),
             lengths=np.full(K, T, np.int64))
    N = 8
    tr = GAILPPOTrainer(
        expert_path=str(tmp_path / "e.npz"),
        gail_run=GAILRunConfig(gail_epoch=1, gail_batch_size=8,
                               num_trajectories=2,
                               subsample_frequency=2),
        env_cfg=EnvConfig(num_disk_as_reward=True),
        run_cfg=SelfPlayConfig(num_envs=N, num_steps=4, num_test_games=4,
                               test_interval=10**9),
        log_fn=lambda step, m: None)
    tr.ensure_initialized()
    # Nonzero accumulator so masks[0] has an observable effect.
    gail_state = tr.gail_state.replace(returns=jnp.full((N,), 5.0))
    expert = jnp.asarray(tr._sample_expert())
    key = jax.random.PRNGKey(0)

    outs = {}
    for name, last_done in (("carry", jnp.zeros((N,), bool)),
                            ("reset", jnp.ones((N,), bool))):
        args = jax.tree.map(jnp.copy, (tr.params, tr.opt_state,
                                       gail_state, tr.sp_state))
        *_, gs, _, _, metrics = tr._gail_train_step(
            *args, last_done, expert, key)
        outs[name] = (np.asarray(gs.ret_rms.mean),
                      float(metrics["gail_reward"]))
    assert not np.allclose(outs["carry"][0], outs["reset"][0])


def test_chain_train_steps_wrapper_semantics():
    """Generic chain wrapper: K sequential step applications, final
    step's metrics returned, key split per step."""
    from gymothelloenv_tpu.train.ppo_trainer import chain_train_steps

    def step(x, key):
        del key
        return x + 1.0, {"x_before": x}

    chained = chain_train_steps(step, 3)
    out, m = chained(jnp.asarray(0.0), jax.random.PRNGKey(0))
    assert float(out) == 3.0
    assert float(m["x_before"]) == 2.0


def test_a2c_chain_updates_runs_all_updates():
    """chain_updates on the subclass trainers must actually run K
    updates per dispatch (regression: the single-update subclass steps
    silently trained 1/K of the requested updates while the base loop
    strode by K)."""
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.a2c_trainer import A2CSelfPlayTrainer
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    def mk(chain):
        return A2CSelfPlayTrainer(
            env_cfg=EnvConfig(num_disk_as_reward=True),
            run_cfg=SelfPlayConfig(num_envs=8, num_steps=4,
                                   num_test_games=4, test_interval=10**9,
                                   chain_updates=chain, hidden_size=64),
            log_fn=lambda step, m: None)

    tr1, tr2 = mk(1), mk(2)
    tr1.ensure_initialized()
    tr2.ensure_initialized()
    key = jax.random.PRNGKey(42)
    ks = jax.random.split(key, 2)

    p, o, s, _ = tr1._train_step(
        *jax.tree.map(jnp.copy,
                      (tr1.params, tr1.opt_state, tr1.sp_state)), ks[0])
    p, o, s, m2 = tr1._train_step(p, o, s, ks[1])
    pc, oc, sc, mc = tr2._train_step(
        *jax.tree.map(jnp.copy,
                      (tr2.params, tr2.opt_state, tr2.sp_state)), key)

    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(pc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(mc["value_loss"]),
                               float(m2["value_loss"]),
                               rtol=1e-3, atol=1e-5)


def test_gail_chain_updates_consume_per_step_expert_batches(tmp_path):
    """GAIL's chained step scans a (chain, ...) expert stack so every
    chained update sees its OWN host-sampled expert batches — two manual
    single steps must equal one chain=2 dispatch."""
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.gail_trainer import (GAILPPOTrainer,
                                                      GAILRunConfig)
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    rng = np.random.RandomState(2)
    K, T = 3, 16
    np.savez(str(tmp_path / "e.npz"),
             states=(rng.rand(K, T, 256) > 0.7).astype(np.float32),
             actions=rng.randint(0, 64, (K, T)).astype(np.int64),
             lengths=np.full(K, T, np.int64))

    def mk(chain):
        return GAILPPOTrainer(
            expert_path=str(tmp_path / "e.npz"),
            gail_run=GAILRunConfig(gail_epoch=1, gail_batch_size=8,
                                   num_trajectories=2,
                                   subsample_frequency=2),
            env_cfg=EnvConfig(num_disk_as_reward=True),
            run_cfg=SelfPlayConfig(num_envs=8, num_steps=4,
                                   num_test_games=4, test_interval=10**9,
                                   chain_updates=chain),
            log_fn=lambda step, m: None)

    tr1, tr2 = mk(1), mk(2)
    tr1.ensure_initialized()
    tr2.ensure_initialized()
    e1 = jnp.asarray(tr1._sample_expert())
    e2 = jnp.asarray(tr1._sample_expert())
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 2)

    args = jax.tree.map(jnp.copy, (tr1.params, tr1.opt_state,
                                   tr1.gail_state, tr1.sp_state))
    p, o, g, s, ld, _ = tr1._gail_train_step(*args, tr1._last_done,
                                             e1, ks[0])
    p, o, g, s, ld, m2 = tr1._gail_train_step(p, o, g, s, ld, e2, ks[1])

    argsc = jax.tree.map(jnp.copy, (tr2.params, tr2.opt_state,
                                    tr2.gail_state, tr2.sp_state))
    pc, oc, gc, sc, ldc, mc = tr2._gail_train_step(
        *argsc, tr2._last_done, jnp.stack([e1, e2]), key)

    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(pc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(ldc))
    np.testing.assert_allclose(float(mc["disc_loss"]),
                               float(m2["disc_loss"]),
                               rtol=1e-3, atol=1e-5)


def test_acktr_chain_updates_smoke():
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.acktr_trainer import ACKTRSelfPlayTrainer
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    logs = []
    tr = ACKTRSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=4, num_test_games=4,
                               test_interval=10**9, chain_updates=2),
        log_fn=lambda step, m: logs.append(m))
    tr.train(4, log_every=1)
    assert tr.update_count == 4
    assert len(logs) == 2          # one dispatch (and log) per chain
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(tr.params))


def test_gail_bc_warmstart_fits_expert_actions(tmp_path):
    """BC pretraining (round 3, --bc-updates) drives the masked
    cross-entropy down on a consistent synthetic expert whose actions
    are always legal under their stored legal-move plane."""
    import jax
    import jax.numpy as jnp

    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.models.distributions import MaskedCategorical
    from gymothelloenv_tpu.train.gail_trainer import (GAILPPOTrainer,
                                                      GAILRunConfig)
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    rng = np.random.RandomState(2)
    K, T, A = 4, 24, 64
    states = (rng.rand(K, T, 256) > 0.7).astype(np.float32)
    # Make every stored action legal in its own legal plane (slots
    # 192:256 of the flattened 4-plane state), deterministic map
    # state -> action so BC has signal to fit.
    actions = np.zeros((K, T), np.int64)
    for k in range(K):
        for t in range(T):
            legal = np.flatnonzero(states[k, t, 192:256] > 0.5)
            if legal.size == 0:
                states[k, t, 192 + 7] = 1.0
                legal = np.asarray([7])
            actions[k, t] = legal[int(states[k, t, :64].sum()) %
                                  legal.size]
    np.savez(str(tmp_path / "expert.npz"), states=states,
             actions=actions, lengths=np.full(K, T, np.int64))

    logs = []
    tr = GAILPPOTrainer(
        expert_path=str(tmp_path / "expert.npz"),
        gail_run=GAILRunConfig(gail_epoch=2, gail_batch_size=16,
                               num_trajectories=4,
                               subsample_frequency=1),
        env_cfg=EnvConfig(num_disk_as_reward=True),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=8,
                               num_test_games=4, test_interval=10**9,
                               hidden_size=64),
        log_fn=lambda step, m: logs.append((step, m)))

    def expert_nll(params):
        s = jnp.asarray(states.reshape(-1, 4, 8, 8))
        a = jnp.asarray(actions.reshape(-1))
        mask = jnp.asarray(states.reshape(-1, 256)[:, 192:] > 0.5)
        logits, _, _ = tr.apply_fn(params, s)
        return float(-MaskedCategorical(logits=logits,
                                        mask=mask).log_prob(a).mean())

    before = expert_nll(tr.params)
    tr.bc_warmstart(60, batch_size=64, log_every=30)
    after = expert_nll(tr.params)
    assert after < before * 0.8, (before, after)
    assert any(step <= 0 and "bc_loss" in m for step, m in logs)
    # Adversarial training still runs on the warm-started params.
    tr.log_fn = lambda step, m: None
    tr.train(1, log_every=1)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(tr.params))


def test_non_ppo_trainers_reject_framestack_and_time_limits(tmp_path):
    """frame_stack / max_episode_plies ride PPO-only machinery; the
    sibling trainers must refuse them loudly (code-review finding,
    round 3) just as they refuse `recurrent`."""
    import pytest

    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.a2c_trainer import A2CSelfPlayTrainer
    from gymothelloenv_tpu.train.acktr_trainer import ACKTRSelfPlayTrainer
    from gymothelloenv_tpu.train.gail_trainer import GAILPPOTrainer
    from gymothelloenv_tpu.train.ppo_trainer import SelfPlayConfig

    rng = np.random.RandomState(0)
    expert = str(tmp_path / "e.npz")
    np.savez(expert, states=rng.rand(2, 8, 256).astype(np.float32),
             actions=rng.randint(0, 64, (2, 8)),
             lengths=np.full(2, 8, np.int64))

    for bad in (dict(frame_stack=2), dict(max_episode_plies=5)):
        cfg = SelfPlayConfig(num_envs=8, num_steps=4, **bad)
        env = EnvConfig(num_disk_as_reward=True)
        with pytest.raises(ValueError, match="PPO-only"):
            A2CSelfPlayTrainer(env_cfg=env, run_cfg=cfg)
        with pytest.raises(ValueError, match="PPO-only"):
            ACKTRSelfPlayTrainer(env_cfg=env, run_cfg=cfg)
        with pytest.raises(ValueError, match="PPO-only"):
            GAILPPOTrainer(expert, env_cfg=env, run_cfg=cfg)
