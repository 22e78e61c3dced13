"""Model zoo and masked-distribution tests."""

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
