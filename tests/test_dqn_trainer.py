import pytest
"""Batched DQN trainer smoke tests (train/dqn_trainer.py collection loop:
slot-scan self-play, pending-pair terminal crediting, n-step FIFO ->
on-device replay -> minibatch updates)."""

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.agents.dqn import DQNConfig
from gymothelloenv_tpu.agents.replay import ReplayConfig
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.dqn_trainer import DQNRunConfig, DQNTrainer


def _make(opponent=None, **dqn_kw):
    cfg = DQNConfig(n_step=dqn_kw.pop("n_step", 1),
                    initial_replay_size=0, batch_size=16, **dqn_kw)
    return DQNTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        dqn_cfg=cfg,
        rb_cfg=ReplayConfig(capacity=2048,
                            prioritized=dqn_kw.get("double", False)),
        run_cfg=DQNRunConfig(num_envs=8, chunk_plies=16,
                             opponent=opponent, num_test_games=4,
                             test_init_rand_steps=4, seed=0),
        log_fn=lambda step, m: None)


def _one_chunk(trainer):
    trainer.ensure_initialized()
    trainer.key, k = jax.random.split(trainer.key)
    trainer.agent, trainer.replay, trainer.roll, metrics = \
        trainer._train_chunk(trainer.agent, trainer.replay, trainer.roll,
                             k)
    return metrics


@pytest.mark.slow
def test_dqn_trainer_selfplay_chunk():
    trainer = _make(opponent=None)
    metrics = _one_chunk(trainer)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["replay_size"]) > 0
    assert int(metrics["transitions"]) > 0
    wins = trainer.evaluate()
    for v in wins.values():
        assert 0.0 <= v <= 1.0


@pytest.mark.slow
def test_dqn_trainer_vs_scripted_chunk():
    trainer = _make(opponent="rand", n_step=3, double=True, dueling=True)
    m1 = _one_chunk(trainer)
    m2 = _one_chunk(trainer)
    assert np.isfinite(float(m2["loss"]))
    # Only the protagonist color learns -> roughly half the transitions
    # of self-play per ply; still strictly growing across chunks.
    assert int(m2["transitions"]) > int(m1["transitions"]) > 0


@pytest.mark.slow
def test_dqn_bit_and_plane_collection_identical():
    """The bit-engine collection path (8x8 default) must fill the replay
    transition-for-transition identically to the plane path: same rules,
    same RNG consumption order, greedy opponent decision-identical
    (core/engine.py greedy parity)."""
    replays = {}
    for force_plane in (False, True):
        cfg = DQNConfig(n_step=2, initial_replay_size=10**9, batch_size=16)
        tr = DQNTrainer(
            env_cfg=EnvConfig(num_disk_as_reward=True),
            dqn_cfg=cfg,
            rb_cfg=ReplayConfig(capacity=2048),
            run_cfg=DQNRunConfig(num_envs=8, chunk_plies=24,
                                 opponent="greedy", seed=3,
                                 force_plane=force_plane),
            log_fn=lambda step, m: None)
        for _ in range(2):
            _one_chunk(tr)
        replays[force_plane] = (tr.replay, int(tr.agent.t))

    (rb_bit, t_bit), (rb_plane, t_plane) = replays[False], replays[True]
    assert t_bit == t_plane > 0
    assert int(rb_bit.size) == int(rb_plane.size) > 0
    # The packed byte rows hold the whole (s, a, r, s', done) transition —
    # bit-identical rows mean bit-identical replays.
    np.testing.assert_array_equal(np.asarray(rb_bit.data),
                                  np.asarray(rb_plane.data))
    # And decoded fields agree too (exercises the unpack path).
    from gymothelloenv_tpu.agents.replay import replay_gather
    idx = jnp.arange(int(rb_bit.size))
    for a, b, name in zip(replay_gather(rb_bit, idx),
                          replay_gather(rb_plane, idx),
                          ("board", "turn", "action", "reward",
                           "next_board", "next_turn", "done")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_dqn_opponent_pool_mode():
    """League-lite self-play: the non-learning color plays greedily from a
    frozen snapshot; only the protagonist color feeds the replay."""
    import jax
    import numpy as np

    from gymothelloenv_tpu.agents.dqn import DQNConfig
    from gymothelloenv_tpu.agents.replay import ReplayConfig
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.dqn_trainer import (DQNRunConfig,
                                                     DQNTrainer)

    run_cfg = DQNRunConfig(num_envs=8, chunk_plies=8, opponent_pool=2,
                           pool_interval=1, test_interval=10_000, seed=11)
    dqn_cfg = DQNConfig(batch_size=8, initial_replay_size=1, n_step=2)
    tr = DQNTrainer(EnvConfig(num_disk_as_reward=True), dqn_cfg,
                    ReplayConfig(capacity=512), run_cfg,
                    log_fn=lambda *a: None)
    tr.train(num_chunks=3, log_every=100)
    assert len(tr.pool) == 2          # trimmed to opponent_pool
    # Pool mode emits ~one learner transition per ply (vs ~2 shared):
    t = int(tr.agent.t)
    assert 0 < t <= 3 * 8 * 8 + 16, t
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(tr.agent.params))


def test_per_block_cumsum_matmul_exact():
    """The MXU triangular-matmul prefix sum (round-5 replacement for the
    reduce-window cumsum, agents/replay._row_cumsum_blocks) is exactly
    jnp.cumsum for exactly-representable priorities, and the stratified
    sampler picks identical indices."""
    import numpy as np

    from gymothelloenv_tpu.agents.replay import (Replay, ReplayConfig,
                                                 _PER_BLOCK,
                                                 _row_cumsum_blocks,
                                                 replay_sample_idx)

    rng = np.random.RandomState(0)
    grid = jnp.asarray(rng.randint(0, 64, (16, _PER_BLOCK)),
                       jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_row_cumsum_blocks(grid)),
        np.asarray(jnp.cumsum(grid, axis=1)))

    # Sampler end-to-end vs an independent flat inverse-CDF search on
    # the same integer priorities + the same stratified targets.
    C = 4 * _PER_BLOCK
    cfg = ReplayConfig(capacity=C, prioritized=True)
    prio = rng.randint(1, 32, (C,)).astype(np.float32)
    size = C - 37
    prio[size:] = 7.0                 # junk beyond size must be ignored
    rb = Replay(data=jnp.zeros((C + 1, 1), jnp.uint8),
                priority=jnp.asarray(np.append(prio, 0.0)),
                max_priority=jnp.float32(32.0),
                write_pos=jnp.int32(0), size=jnp.int32(size))
    batch = 256
    key = jax.random.PRNGKey(3)
    idx = np.asarray(replay_sample_idx(rb, cfg, key, batch))

    live = prio.copy()
    live[size:] = 0.0
    flat = np.cumsum(live)
    u = np.asarray(jax.random.uniform(key, (batch,)))
    targets = (np.arange(batch) + u) * (flat[-1] / batch)
    want = np.searchsorted(flat, targets, side="left")
    np.testing.assert_array_equal(idx, np.clip(want, 0, size - 1))
