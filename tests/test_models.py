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
