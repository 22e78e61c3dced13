"""Rainbow (noisy nets + C51) tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.agents.rainbow import (RainbowConfig,
                                              _project_distribution,
                                              expected_q,
                                              make_rainbow_net,
                                              make_rainbow_optimizer,
                                              rainbow_act, rainbow_init,
                                              rainbow_train_batch)
from gymothelloenv_tpu.agents.replay import (ReplayConfig, replay_init,
                                             replay_insert)


CFG = RainbowConfig(n_step=1, initial_replay_size=0)


def test_net_outputs_atom_logits():
    """The net returns RAW atom logits (round 4: normalization moved to
    consumers so the loss can select its action row first); softmaxing
    the atom axis must give a distribution, and the dueling combine
    zeroes the per-row advantage mean."""
    net = make_rainbow_net(CFG)
    x = jnp.zeros((3, 3, 8, 8))
    params = net.init(jax.random.PRNGKey(0), x)
    logits = net.apply(params, x)
    assert logits.shape == (3, 64, 51)
    probs = jax.nn.softmax(logits, axis=-1)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    # Noisy path differs from deterministic path.
    logits_noisy = net.apply(params, x, jax.random.PRNGKey(1))
    assert float(jnp.abs(logits_noisy - logits).max()) > 1e-6
    # Same noise key -> same output (reproducible).
    logits_noisy2 = net.apply(params, x, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(logits_noisy),
                               np.asarray(logits_noisy2))


def test_projection_identity_when_reward_zero_gamma_one():
    cfg = RainbowConfig(gamma=1.0, n_step=1)
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0),
                                             (4, cfg.num_atoms)))
    proj = _project_distribution(probs, jnp.zeros(4), jnp.ones(4), cfg)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(probs),
                               rtol=1e-5, atol=1e-6)


def test_projection_terminal_is_delta_at_reward():
    cfg = CFG
    probs = jnp.full((2, cfg.num_atoms), 1.0 / cfg.num_atoms)
    proj = _project_distribution(probs, jnp.asarray([0.5, -1.0]),
                                 jnp.zeros(2), cfg)
    support = np.asarray(cfg.support)
    mean = (np.asarray(proj) * support).sum(-1)
    np.testing.assert_allclose(mean, [0.5, -1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(proj.sum(-1)), 1.0, rtol=1e-6)


def test_rainbow_train_learns_value():
    """Train on fixed terminal transitions with reward 0.75 for action 5;
    expected Q(s, 5) must approach 0.75."""
    cfg = RainbowConfig(n_step=1, initial_replay_size=0, lr=1e-3)
    rb_cfg = ReplayConfig(capacity=512, prioritized=True)
    key = jax.random.PRNGKey(0)
    state = rainbow_init(cfg, key)
    net = make_rainbow_net(cfg)
    apply_fn = lambda p, x, k=None: net.apply(p, x, k)
    optimizer = make_rainbow_optimizer(cfg)
    replay = replay_init(rb_cfg)

    board = jnp.zeros((64, 8, 8), jnp.int8)
    replay = replay_insert(
        replay, rb_cfg, board, jnp.full((64,), -1, jnp.int8),
        jnp.full((64,), 5, jnp.int32), jnp.full((64,), 0.75),
        board, jnp.full((64,), 1, jnp.int8), jnp.ones((64,), bool),
        jnp.ones((64,), bool))

    train = jax.jit(lambda s, r, k: rainbow_train_batch(
        s, r, cfg, rb_cfg, apply_fn, optimizer, k))
    for i in range(150):
        key, k = jax.random.split(key)
        state, replay, loss = train(state, replay, k)
    from gymothelloenv_tpu.agents.dqn import featurize3
    q = expected_q(net.apply(state.params,
                             featurize3(board[:1],
                                        jnp.full((1,), -1, jnp.int8))),
                   cfg)
    assert abs(float(q[0, 5]) - 0.75) < 0.1, float(q[0, 5])


def test_rainbow_trainer_chunk_and_eval():
    """Batched RainbowTrainer: one collect+train chunk runs, produces
    finite loss, replay fills, and eval returns win rates in [0, 1]."""
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.dqn_trainer import DQNRunConfig
    from gymothelloenv_tpu.train.rainbow_trainer import RainbowTrainer

    cfg = RainbowConfig(n_step=3, initial_replay_size=0, batch_size=16)
    trainer = RainbowTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        rainbow_cfg=cfg,
        rb_cfg=ReplayConfig(capacity=2048, prioritized=True),
        run_cfg=DQNRunConfig(num_envs=8, chunk_plies=16,
                             num_test_games=4, test_init_rand_steps=4,
                             seed=0),
        log_fn=lambda step, m: None)
    trainer.ensure_initialized()
    trainer.key, k = jax.random.split(trainer.key)
    trainer.agent, trainer.replay, trainer.roll, metrics = \
        trainer._train_chunk(trainer.agent, trainer.replay, trainer.roll,
                             k)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["replay_size"]) > 0
    assert int(metrics["transitions"]) > 0
    assert float(metrics["epsilon"]) == 0.0   # noisy nets, no epsilon
    wins = trainer.evaluate()
    for v in wins.values():
        assert 0.0 <= v <= 1.0


def test_rainbow_act_legal():
    cfg = CFG
    state = rainbow_init(cfg, jax.random.PRNGKey(0))
    net = make_rainbow_net(cfg)
    apply_fn = lambda p, x, k=None: net.apply(p, x, k)
    board = jnp.zeros((4, 8, 8), jnp.int8)
    legal = jnp.zeros((4, 64), bool).at[:, 19].set(True)
    a = rainbow_act(state.params, apply_fn, board,
                    jnp.full((4,), -1, jnp.int8), legal,
                    jax.random.PRNGKey(1), cfg)
    assert np.all(np.asarray(a) == 19)


def test_per_block_sampler_matches_flat_searchsorted():
    """The two-level PER sampler must reproduce the flat
    cumsum+searchsorted indices exactly on float-exact (integer-valued)
    priorities, across capacities that do and don't divide the block."""
    import numpy as np

    from gymothelloenv_tpu.agents.replay import replay_sample_idx

    for C, size_frac in ((4096, 1.0), (5000, 0.37), (512, 0.2)):
        cfg = ReplayConfig(capacity=C, prioritized=True)
        rb = replay_init(cfg)
        size = max(1, int(C * size_frac))
        prio = jax.random.randint(jax.random.PRNGKey(C), (C + 1,),
                                  1, 100).astype(jnp.float32)
        rb = rb.replace(priority=prio, size=jnp.int32(size))
        idx = replay_sample_idx(rb, cfg, jax.random.PRNGKey(7), 1024)

        p = np.where(np.arange(C) < size, np.asarray(prio[:C]), 0.0)
        cum = np.cumsum(p)
        u = np.asarray(jax.random.uniform(jax.random.PRNGKey(7), (1024,)))
        targets = (np.arange(1024) + u) * (cum[-1] / 1024)
        ref = np.clip(np.searchsorted(cum, targets, side="left"),
                      0, size - 1)
        np.testing.assert_array_equal(np.asarray(idx), ref,
                                      err_msg=f"C={C}")


def test_per_block_sampler_proportional():
    """Empirical sampling frequency tracks priorities (9:1 split)."""
    import numpy as np

    from gymothelloenv_tpu.agents.replay import replay_sample_idx

    cfg = ReplayConfig(capacity=2048, prioritized=True)
    rb = replay_init(cfg)
    pr = jnp.concatenate([jnp.full((1024,), 1.0), jnp.full((1024,), 9.0),
                          jnp.zeros((1,))])
    rb = rb.replace(priority=pr, size=jnp.int32(2048))
    counts = np.zeros(2048)
    for i in range(10):
        idx = np.asarray(replay_sample_idx(rb, cfg,
                                           jax.random.PRNGKey(i), 4096))
        np.add.at(counts, idx, 1)
    frac_hi = counts[1024:].sum() / counts.sum()
    assert abs(frac_hi - 0.9) < 0.02


def test_projection_matches_scatter_reference():
    """The kernel-interpolation projection equals the classic floor/ceil
    scatter-add formulation (including integer-b and clipped edges)."""
    import numpy as np

    from gymothelloenv_tpu.agents.rainbow import (RainbowConfig,
                                                  _project_distribution)

    cfg = RainbowConfig()
    key = jax.random.PRNGKey(0)
    N = 256
    probs = jax.nn.softmax(jax.random.normal(key, (N, cfg.num_atoms)), -1)
    rewards = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(1), (N - 4,),
                           minval=-2.0, maxval=2.0),
        jnp.asarray([0.0, cfg.v_min, cfg.v_max, 1.0])])  # exact-atom hits
    not_done = jax.random.bernoulli(
        jax.random.PRNGKey(2), 0.7, (N,)).astype(jnp.float32)
    got = np.asarray(_project_distribution(probs, rewards, not_done, cfg))

    # Scatter reference (the previous implementation).
    z = np.asarray(cfg.support)
    tz = np.clip(np.asarray(rewards)[:, None]
                 + np.asarray(not_done)[:, None] * cfg.gamma_n * z[None],
                 cfg.v_min, cfg.v_max)
    dz = (cfg.v_max - cfg.v_min) / (cfg.num_atoms - 1)
    b = (tz - cfg.v_min) / dz
    lo = np.clip(np.floor(b), 0, cfg.num_atoms - 1).astype(int)
    hi = np.clip(np.ceil(b), 0, cfg.num_atoms - 1).astype(int)
    w_lo = np.where(hi == lo, 1.0, hi - b)
    w_hi = np.where(hi == lo, 0.0, b - lo)
    ref = np.zeros_like(got)
    p = np.asarray(probs)
    for i in range(N):
        for j in range(cfg.num_atoms):
            ref[i, lo[i, j]] += p[i, j] * w_lo[i, j]
            ref[i, hi[i, j]] += p[i, j] * w_hi[i, j]
    np.testing.assert_allclose(got, ref, atol=1e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_loss_select_first_matches_normalize_first():
    """Round-4 restructure: selecting the action row BEFORE log_softmax
    must equal normalizing everything then selecting (atoms normalize
    per (sample, action) row), for both the target distribution and the
    train-side KL."""
    from gymothelloenv_tpu.agents.rainbow import (_project_distribution,
                                                  rainbow_loss_grads)

    cfg = RainbowConfig(num_atoms=11, batch_size=8,
                        initial_replay_size=0)
    state = rainbow_init(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    n = 8
    board = jnp.asarray(rng.randint(-1, 2, (n, 8, 8)), jnp.int8)
    turn = jnp.asarray(rng.choice([-1, 1], n), jnp.int8)
    action = jnp.asarray(rng.randint(0, 64, n), jnp.int32)
    reward = jnp.asarray(rng.randn(n) * 0.1, jnp.float32)
    done = jnp.asarray(rng.rand(n) < 0.3)
    batch = (board, turn, action, reward, board, -turn, done)

    net = make_rainbow_net(cfg)
    apply_fn = lambda p, x, k=None: net.apply(p, x, k)
    key = jax.random.PRNGKey(9)
    (loss, kl), _ = rainbow_loss_grads(state, cfg, apply_fn, batch, key)

    # Reference: normalize-everything-then-select (the old formulation),
    # with the same key-split structure.
    from gymothelloenv_tpu.agents.dqn import featurize3
    k_online, k_target, k_train = jax.random.split(key, 3)
    next_obs = featurize3(board, -turn)
    online_next = jax.nn.log_softmax(
        apply_fn(state.params, next_obs, k_online), axis=-1)
    q = (jnp.exp(online_next) * cfg.support).sum(-1)
    next_a = jnp.argmax(q, axis=-1)
    target_next = jax.nn.log_softmax(
        apply_fn(state.target_params, next_obs, k_target), axis=-1)
    next_probs = jnp.exp(jnp.take_along_axis(
        target_next, next_a[:, None, None], axis=1))[:, 0]
    proj = _project_distribution(next_probs, reward,
                                 1.0 - done.astype(jnp.float32), cfg)
    log_p = jax.nn.log_softmax(
        apply_fn(state.params, featurize3(board, turn), k_train), axis=-1)
    log_pa = jnp.take_along_axis(log_p, action[:, None, None],
                                 axis=1)[:, 0]
    kl_ref = -(proj * log_pa).sum(-1)
    np.testing.assert_allclose(np.asarray(kl), np.asarray(kl_ref),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(float(loss), float(kl_ref.mean()),
                               rtol=2e-5)
