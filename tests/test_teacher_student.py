"""Teacher-student trainer + masked-GAE tests."""

import jax
import pytest

pytestmark = pytest.mark.slow
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                          compute_gae, compute_gae_masked)
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.teacher_student import (TeacherStudentConfig,
                                                     TeacherStudentTrainer,
                                                     collect_ts_rollout,
                                                     ts_init)
from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                 make_network)


def _roll(T, N, key, **over):
    ks = jax.random.split(key, 3)
    base = dict(
        obs=jnp.zeros((T, N, 4, 4, 4)),
        action=jnp.zeros((T, N), jnp.int32),
        logp=jnp.zeros((T, N)),
        value=jax.random.normal(ks[0], (T, N)),
        reward=jax.random.normal(ks[1], (T, N)),
        done=jax.random.bernoulli(ks[2], 0.15, (T, N)),
        legal=jnp.ones((T, N, 16), bool))
    base.update(over)
    return Transition(**base)


def test_masked_gae_equals_dense_gae_when_all_valid():
    cfg = PPOConfig(gamma=0.97, gae_lambda=0.9)
    roll = _roll(12, 4, jax.random.PRNGKey(0))
    boot = jax.random.normal(jax.random.PRNGKey(1), (4,))
    a1, r1 = compute_gae(roll, boot, cfg)
    a2, r2 = compute_gae_masked(roll, jnp.ones((12, 4)), boot, cfg)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-5)


def test_masked_gae_is_bubble_transparent():
    """Inserting weight-0 bubbles must not change the advantages of the
    real transitions."""
    cfg = PPOConfig(gamma=0.97, gae_lambda=0.9)
    T, N = 10, 3
    roll = _roll(T, N, jax.random.PRNGKey(2))
    boot = jax.random.normal(jax.random.PRNGKey(3), (N,))
    adv_dense, _ = compute_gae(roll, boot, cfg)

    # Interleave a bubble after every real slot (bubbles carry garbage).
    rng = np.random.RandomState(0)

    def interleave(x, bubble_val):
        shape = (2 * T,) + x.shape[1:]
        out = np.full(shape, bubble_val, dtype=np.asarray(x).dtype)
        out[0::2] = np.asarray(x)
        return jnp.asarray(out)

    roll2 = Transition(
        obs=interleave(roll.obs, 0.0),
        action=interleave(roll.action, 0),
        logp=interleave(roll.logp, 0.0),
        value=interleave(roll.value, 123.0),     # garbage in bubbles
        reward=interleave(roll.reward, -7.0),
        done=interleave(roll.done, True),
        legal=interleave(roll.legal, True))
    weights = jnp.asarray(
        np.tile(np.array([1.0, 0.0]), T)[:, None].repeat(N, 1))
    adv_masked, _ = compute_gae_masked(roll2, weights, boot, cfg)
    np.testing.assert_allclose(np.asarray(adv_masked[0::2]),
                               np.asarray(adv_dense), rtol=1e-4,
                               atol=1e-5)


def test_ts_rollout_invariants():
    env_cfg = EnvConfig(num_disk_as_reward=True)
    net = make_network(env_cfg)
    apply_fn = make_apply_fn(net)
    key = jax.random.PRNGKey(0)
    params_t = net.init(key, jnp.zeros((1, 4, 8, 8)))
    params_s = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 8)))
    ts = ts_init(key, env_cfg, 8, 0)
    ts, (roll_t, w_t, _), (roll_s, w_s, _) = jax.jit(
        collect_ts_rollout,
        static_argnames=("apply_fn", "cfg", "num_steps",
                         "init_rand_steps"))(
        params_t, params_s, apply_fn=apply_fn, ts=ts, cfg=env_cfg,
        num_steps=40, init_rand_steps=0,
        teacher_reward=jnp.float32(0.5), key=jax.random.PRNGKey(2))

    w_t, w_s = np.asarray(w_t), np.asarray(w_s)
    # Streams are reasonably full: teacher ~1 of 2 records/slot, student
    # ~1 of 4 (terminal/pass/fresh records are mostly bubbles).
    assert w_t.mean() > 0.4, w_t.mean()
    assert w_s.mean() > 0.2, w_s.mean()
    # Teacher terminal rewards equal the injected improvement signal.
    rt = np.asarray(roll_t.reward)
    dt = np.asarray(roll_t.done)
    terminal_t = rt[(w_t > 0) & dt]
    assert terminal_t.size > 0
    np.testing.assert_allclose(terminal_t, 0.5)
    # Student terminal rewards are disk diffs.
    rs = np.asarray(roll_s.reward)
    ds = np.asarray(roll_s.done)
    terminal_s = rs[(w_s > 0) & ds]
    assert terminal_s.size > 0
    assert np.abs(terminal_s).max() <= 64
    # Recorded actions were legal.
    for roll, w in ((roll_t, w_t), (roll_s, w_s)):
        legal = np.asarray(roll.legal)
        action = np.asarray(roll.action)
        Tn, N = action.shape
        ok = legal[np.arange(Tn)[:, None], np.arange(N)[None, :], action]
        assert ok[np.asarray(w) > 0].all()


def test_teacher_student_trainer_smoke():
    tr = TeacherStudentTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(lr=1e-4, num_updates=4),
        run_cfg=TeacherStudentConfig(num_envs=8, num_steps=8,
                                     test_interval=2, num_test_games=8,
                                     teacher_test_interval=1000))
    tr.train(num_chunks=3, log_every=100)
    assert tr.chunk_count == 3
    assert set(tr.win_avg) == {"rand", "greedy"}
