"""Model zoo and masked-distribution tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.models import (ActorCriticNet, DQNNet, DuelingDQNNet,
                                      MaskedCategorical, MLPBase, PolicyNet)


def test_shapes_8x8():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((5, 4, 8, 8))
    q = DQNNet(num_actions=64)
    params = q.init(key, x)
    assert q.apply(params, x).shape == (5, 64)

    dq = DuelingDQNNet(num_actions=64)
    assert dq.apply(dq.init(key, x), x).shape == (5, 64)

    ac = ActorCriticNet(num_actions=64)
    logits, value = ac.apply(ac.init(key, x), x)
    assert logits.shape == (5, 64) and value.shape == (5,)

    pol = PolicyNet(num_actions=64)
    logits, value, h = pol.apply(pol.init(key, x), x)
    assert logits.shape == (5, 64) and value.shape == (5,) and h is None

    mlp = MLPBase(num_actions=64)
    xf = jnp.zeros((5, 128))
    logits, value = mlp.apply(mlp.init(key, xf), xf)
    assert logits.shape == (5, 64) and value.shape == (5,)


def test_recurrent_policy():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((5, 4, 8, 8))
    h0 = jnp.zeros((5, 512))
    mask = jnp.ones((5,))
    pol = PolicyNet(num_actions=64, recurrent=True)
    params = pol.init(key, x, h0, mask)
    logits, value, h1 = pol.apply(params, x, h0, mask)
    assert h1.shape == (5, 512)
    # mask=0 resets hidden state: output must equal fresh-hidden output.
    logits_a, _, _ = pol.apply(params, x, h1, jnp.zeros((5,)))
    logits_b, _, _ = pol.apply(params, x, h0, mask)
    np.testing.assert_allclose(np.asarray(logits_a), np.asarray(logits_b),
                               rtol=1e-6)


def test_masked_categorical_restricts_to_legal():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[0.0, 5.0, -1.0, 2.0]])
    mask = jnp.asarray([[True, False, True, False]])
    d = MaskedCategorical(logits=logits, mask=mask)
    samples = jax.vmap(lambda k: d.sample(k)[0])(jax.random.split(key, 256))
    assert set(np.asarray(samples).tolist()) <= {0, 2}
    # Distribution over the legal subset == softmax of legal logits.
    probs = np.asarray(d.probs_masked())[0]
    want = np.exp([0.0, -1.0]) / np.exp([0.0, -1.0]).sum()
    np.testing.assert_allclose(probs[[0, 2]], want, rtol=1e-5)
    assert probs[1] < 1e-8 and probs[3] < 1e-8
    # log_prob of an illegal action is 0 (reference fallback).
    assert float(d.log_prob(jnp.asarray([1]))[0]) == 0.0
    np.testing.assert_allclose(float(d.log_prob(jnp.asarray([2]))[0]),
                               np.log(want[1]), rtol=1e-5)


def test_masked_categorical_empty_legal_fallback():
    d = MaskedCategorical(logits=jnp.zeros((2, 4)),
                          mask=jnp.zeros((2, 4), bool))
    a = d.sample(jax.random.PRNGKey(0))
    assert np.all(np.asarray(a) == 0)
    assert np.all(np.asarray(d.log_prob(a)) == 0.0)


def test_entropy_full_vs_masked():
    logits = jnp.asarray([[0.0, 0.0, 0.0, 0.0]])
    mask = jnp.asarray([[True, True, False, False]])
    d = MaskedCategorical(logits=logits, mask=mask)
    np.testing.assert_allclose(float(d.entropy_full()[0]), np.log(4),
                               rtol=1e-5)
    np.testing.assert_allclose(float(d.entropy_masked()[0]), np.log(2),
                               rtol=1e-5)


def test_diag_normal_matches_torch():
    """DiagNormal log_prob/entropy == torch.distributions.Normal with the
    FixedNormal sum-over-action-dim convention (distributions.py:36-44;
    the reference's own entropy method is typo-broken — ours works)."""
    import torch
    from gymothelloenv_tpu.models.distributions import DiagNormal

    rng = np.random.RandomState(0)
    mean = rng.randn(5, 3).astype(np.float32)
    log_std = rng.randn(5, 3).astype(np.float32) * 0.3
    actions = rng.randn(5, 3).astype(np.float32)

    d = DiagNormal(mean=jnp.asarray(mean), log_std=jnp.asarray(log_std))
    td = torch.distributions.Normal(torch.tensor(mean),
                                    torch.tensor(np.exp(log_std)))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(actions))),
        td.log_prob(torch.tensor(actions)).sum(-1).numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d.entropy()), td.entropy().sum(-1).numpy(), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(d.mode()), mean)
    s = d.sample(jax.random.PRNGKey(1))
    assert s.shape == mean.shape and np.isfinite(np.asarray(s)).all()


def test_bernoulli_dist_matches_torch():
    """BernoulliDist log_prob/entropy/mode == torch.distributions.Bernoulli
    with the FixedBernoulli sum-over-last-dim convention
    (distributions.py:48-57)."""
    import torch
    from gymothelloenv_tpu.models.distributions import BernoulliDist

    rng = np.random.RandomState(1)
    logits = (rng.randn(4, 6) * 2).astype(np.float32)
    actions = (rng.rand(4, 6) > 0.5).astype(np.float32)

    d = BernoulliDist(logits=jnp.asarray(logits))
    td = torch.distributions.Bernoulli(logits=torch.tensor(logits))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(actions))),
        td.log_prob(torch.tensor(actions)).sum(-1).numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d.entropy()), td.entropy().sum(-1).numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(d.mode()),
        (torch.sigmoid(torch.tensor(logits)) > 0.5).float().numpy())
    s = d.sample(jax.random.PRNGKey(2))
    assert set(np.unique(np.asarray(s))) <= {0.0, 1.0}


def test_gaussian_and_bernoulli_heads_init_and_apply():
    """DiagGaussianHead: zero-init log_std and orthogonal mean projection
    (DiagGaussian, distributions.py:75-96); BernoulliHead applies."""
    from gymothelloenv_tpu.models import BernoulliHead, DiagGaussianHead

    x = jnp.ones((7, 16))
    gh = DiagGaussianHead(num_outputs=4)
    params = gh.init(jax.random.PRNGKey(0), x)
    np.testing.assert_array_equal(
        np.asarray(params["params"]["log_std"]), np.zeros(4))
    dist = gh.apply(params, x)
    assert dist.mean.shape == (7, 4)
    assert float(dist.entropy()[0]) > 0

    bh = BernoulliHead(num_outputs=5)
    bp = bh.init(jax.random.PRNGKey(1), x)
    bdist = bh.apply(bp, x)
    assert bdist.logits.shape == (7, 5)


@pytest.mark.slow
def test_alt_trunks_match_direct():
    """ConvTrunk impl='lifted'/'im2col' — the matmul-lowered paths — must
    produce the same outputs, gradients, and param tree as the direct
    conv path, for 8x8 and a non-default board size."""
    key = jax.random.PRNGKey(3)
    import itertools
    for board, impl in itertools.product((8, 6), ("lifted", "im2col")):
        acts = board * board
        obs = jax.random.normal(key, (16, 4, board, board))
        net = PolicyNet(num_actions=acts)
        netl = PolicyNet(num_actions=acts, trunk_impl=impl)
        params = net.init(key, obs[:1])
        params_l = netl.init(key, obs[:1])
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params_l))
        assert all(a.shape == b.shape for a, b in
                   zip(jax.tree.leaves(params), jax.tree.leaves(params_l)))

        lo, v, _ = jax.jit(net.apply)(params, obs)
        lo_l, v_l, _ = jax.jit(netl.apply)(params, obs)
        np.testing.assert_allclose(np.asarray(lo), np.asarray(lo_l),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_l),
                                   atol=1e-5)

        def loss(p, apply):
            logits, value, _ = apply(p, obs)
            return (logits ** 2).mean() + (value ** 2).mean()

        g = jax.grad(lambda p: loss(p, net.apply))(params)
        g_l = jax.grad(lambda p: loss(p, netl.apply))(params)
        for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_l)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_alt_trunk_in_ppo_update():
    """A full ppo_update through the im2col net runs and stays finite."""
    from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                              make_optimizer, ppo_update)

    key = jax.random.PRNGKey(4)
    T, N = 8, 16
    net = PolicyNet(num_actions=64, trunk_impl="im2col")
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    cfg = PPOConfig(num_updates=2)
    opt = make_optimizer(cfg)
    opt_state = opt.init(params)
    ks = jax.random.split(key, 4)
    roll = Transition(
        obs=jax.random.bernoulli(ks[0], 0.3, (T, N, 4, 8, 8)).astype(
            jnp.int8),
        action=jax.random.randint(ks[1], (T, N), 0, 64),
        logp=-jnp.ones((T, N)) * 3.0,
        value=jax.random.normal(ks[2], (T, N)) * 0.1,
        reward=jnp.zeros((T, N)),
        done=jnp.zeros((T, N), bool),
        legal=jnp.ones((T, N, 64), bool))
    params2, _, metrics = jax.jit(
        lambda p, o, r, k: ppo_update(p, o, r, jnp.zeros((N,)), k,
                                      lambda pp, oo: net.apply(pp, oo),
                                      opt, cfg))(
        params, opt_state, roll, ks[3])
    assert all(np.isfinite(np.asarray(m)).all()
               for m in jax.tree.leaves(metrics))
    assert all(np.isfinite(np.asarray(p)).all()
               for p in jax.tree.leaves(params2))


def test_width_mult_and_hidden_size():
    """Capacity knobs beyond reference parity: width_mult scales every
    trunk conv; hidden_size the fc. Default (1, 512) stays parity."""
    key = jax.random.PRNGKey(5)
    obs = jnp.zeros((2, 4, 8, 8))
    wide = PolicyNet(num_actions=64, width_mult=2, hidden_size=1024)
    params = wide.init(key, obs)
    trunk = params["params"]["ConvTrunk_0"]
    assert trunk["Conv_0"]["kernel"].shape == (3, 3, 4, 64)
    assert trunk["Conv_1"]["kernel"].shape == (2, 2, 64, 128)
    assert trunk["Conv_2"]["kernel"].shape == (2, 2, 128, 128)
    assert params["params"]["Dense_0"]["kernel"].shape == (512, 1024)
    logits, value, _ = wide.apply(params, obs)
    assert logits.shape == (2, 64) and value.shape == (2,)

    # Parity default unchanged.
    base = PolicyNet(num_actions=64)
    pb = base.init(key, obs)
    assert pb["params"]["ConvTrunk_0"]["Conv_0"]["kernel"].shape == (
        3, 3, 4, 32)

    # Wide + lifted/im2col impls still share the param tree.
    for impl in ("lifted", "im2col"):
        alt = PolicyNet(num_actions=64, width_mult=2, hidden_size=1024,
                        trunk_impl=impl)
        pa = alt.init(key, obs)
        assert (jax.tree_util.tree_structure(pa)
                == jax.tree_util.tree_structure(params))
        la, va, _ = alt.apply(params, obs)
        np.testing.assert_allclose(np.asarray(la), np.asarray(logits),
                                   atol=1e-5)
