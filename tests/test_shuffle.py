"""ops/shuffle: the sort-free epoch-shuffle bijection and its PPO wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gymothelloenv_tpu.ops.shuffle import (hash_perm, is_power_of_two,
                                           minibatch_indices)


@pytest.mark.parametrize("n", [1, 2, 8, 64, 1024, 1 << 18])
def test_hash_perm_is_a_bijection(n):
    for seed in (0, 1, 7):
        out = np.asarray(hash_perm(jax.random.PRNGKey(seed), n,
                                   jnp.arange(n, dtype=jnp.int32)))
        assert out.min() >= 0 and out.max() < n
        assert len(np.unique(out)) == n  # permutation of [0, n)


def test_hash_perm_keys_differ():
    n = 4096
    a = np.asarray(hash_perm(jax.random.PRNGKey(0), n, jnp.arange(n)))
    b = np.asarray(hash_perm(jax.random.PRNGKey(1), n, jnp.arange(n)))
    assert (a != b).mean() > 0.9  # different keys give different orders


def test_hash_perm_actually_shuffles():
    n = 1 << 14
    out = np.asarray(hash_perm(jax.random.PRNGKey(3), n, jnp.arange(n)))
    # The first minibatch-sized block must mix positions from across the
    # whole range, not cluster (arithmetic-progression failure mode).
    block = out[: n // 4]
    quartile_counts = np.histogram(block, bins=4, range=(0, n))[0]
    assert quartile_counts.min() > n // 4 * 0.15


def test_minibatch_indices_partition():
    """The 4 minibatch index blocks of one epoch tile [0, n) exactly."""
    n, mb = 1024, 256
    key = jax.random.PRNGKey(5)
    blocks = [np.asarray(minibatch_indices(key, n, jnp.int32(i), mb))
              for i in range(4)]
    assert sorted(np.concatenate(blocks).tolist()) == list(range(n))


def test_is_power_of_two():
    assert [is_power_of_two(n) for n in (1, 2, 3, 4, 2000, 2048, 0, -4)] \
        == [True, True, False, True, False, True, False, False]


def test_ppo_update_hash_matches_sort_when_order_is_irrelevant():
    """With one minibatch per epoch the shuffle only permutes rows inside a
    mean-reduced loss — hash and sort modes must produce the same update to
    float reduction-order noise."""
    from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                              make_optimizer, ppo_update)
    from gymothelloenv_tpu.models.nets import PolicyNet

    key = jax.random.PRNGKey(2)
    T, N = 4, 16
    net = PolicyNet(num_actions=64)
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    ks = jax.random.split(key, 6)
    roll = Transition(
        obs=jax.random.bernoulli(ks[0], 0.3, (T, N, 4, 8, 8)).astype(
            jnp.int8),
        action=jax.random.randint(ks[1], (T, N), 0, 64),
        logp=-jnp.abs(jax.random.normal(ks[2], (T, N))),
        value=jax.random.normal(ks[3], (T, N)) * 0.1,
        reward=jax.random.normal(ks[4], (T, N)) * 0.1,
        done=jax.random.bernoulli(ks[5], 0.1, (T, N)),
        legal=jnp.ones((T, N, 64), bool))
    apply_fn = lambda p, o: net.apply(p, o)  # noqa: E731

    outs = []
    for mode in ("sort", "hash"):
        cfg = PPOConfig(num_updates=2, num_mini_batch=1, ppo_epochs=2,
                        shuffle=mode)
        opt = make_optimizer(cfg)
        p2, _, m = jax.jit(
            lambda p, o, r, k, opt=opt, cfg=cfg: ppo_update(
                p, o, r, jnp.zeros((N,)), k, apply_fn, opt, cfg))(
            params, opt.init(params), roll, jax.random.PRNGKey(11))
        outs.append((p2, m))
    for a, b in zip(jax.tree.leaves(outs[0][0]),
                    jax.tree.leaves(outs[1][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_ppo_update_hash_falls_back_for_non_pow2():
    """batch_size = T*N = 3*16 = 48 is not a power of two — the hash mode
    must silently use the sort permutation and still run."""
    from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                              make_optimizer, ppo_update)
    from gymothelloenv_tpu.models.nets import PolicyNet

    key = jax.random.PRNGKey(4)
    T, N = 3, 16
    net = PolicyNet(num_actions=64)
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    roll = Transition(
        obs=jnp.zeros((T, N, 4, 8, 8), jnp.int8),
        action=jnp.zeros((T, N), jnp.int32),
        logp=jnp.zeros((T, N)),
        value=jnp.zeros((T, N)),
        reward=jnp.ones((T, N)),
        done=jnp.zeros((T, N), bool),
        legal=jnp.ones((T, N, 64), bool))
    cfg = PPOConfig(num_updates=2, num_mini_batch=2, ppo_epochs=1,
                    shuffle="hash")
    opt = make_optimizer(cfg)
    apply_fn = lambda p, o: net.apply(p, o)  # noqa: E731
    p2, _, metrics = jax.jit(
        lambda p, o, r, k: ppo_update(p, o, r, jnp.zeros((N,)), k,
                                      apply_fn, opt, cfg))(
        params, opt.init(params), roll, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["value_loss"]))
