"""Action distributions.

``MaskedCategorical`` replaces the reference's per-env Python loop that
builds a ``FixedCategorical`` over each env's legal-move logits
(a2c_ppo_acktr/model.py:60-98, :156-178) with a single batched
masked-softmax — the reference's main throughput sin, gone.

``DiagNormal``/``BernoulliDist`` rebuild the vendored library's other two
heads (``FixedNormal``/``FixedBernoulli`` + ``DiagGaussian``/``Bernoulli``
modules, distributions.py:36-57, :75-109) used for continuous/binary
action spaces: log-probs and entropies sum over the action dimension.
Note: the reference's ``FixedNormal.entrop``/``FixedBernoulli.log_probs``
call ``super.entropy()``/``super.log_prob`` without parentheses/instance —
broken as shipped (known defect; rebuilt working, not reproduced).

Semantics parity:
  * sampling/log-prob over the *legal* subset == softmax of logits with
    illegal entries at -inf (identical distribution to indexing the legal
    logits first).
  * empty legal set: action 0 with log-prob 0 (model.py:71-74, :167-168).
  * ``entropy_full`` is the UNMASKED softmax entropy — both reference update
    rules feed the full-distribution entropy into the entropy bonus
    (model.py:178-179, ppo.py:101-104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

_NEG_INF = -1e9


@struct.dataclass
class MaskedCategorical:
    logits: jnp.ndarray  # (..., A) raw network outputs
    mask: jnp.ndarray    # bool (..., A) legal actions

    @property
    def any_legal(self) -> jnp.ndarray:
        return self.mask.any(axis=-1)

    @property
    def masked_logits(self) -> jnp.ndarray:
        return jnp.where(self.mask, self.logits, _NEG_INF)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        """Inverse-CDF categorical: one uniform per row against the
        cumsum of unnormalized masked-softmax weights.

        Same distribution as ``jax.random.categorical`` (exact inverse
        transform), chosen for the TPU cost profile: gumbel-argmax needs
        A random words per row plus a variadic (value, index) argmax
        reduce, which traced as the single most expensive fusion of the
        whole collection scan (~5 of 12.6 device-ms at N=4096,
        scripts/trace_collect.py); this form needs ONE random word per
        row and only max/sum/compare-count reduces, which fuse cleanly.

        ``u`` is drawn in (0, 1] (1 - uniform[0,1)) so ``t = u * total``
        is strictly positive — the count of ``cumsum < t`` then always
        lands on a legal action (the cumsum increases only at legal
        entries).  Empty legal rows fall back to action 0
        (model.py:71-74)."""
        ml = self.masked_logits
        w = jnp.exp(ml - jax.lax.stop_gradient(ml).max(-1, keepdims=True))
        w = jnp.where(self.mask, w, 0.0)
        # Row prefix-sum as a triangular matmul: jnp.cumsum lowers to a
        # reduce-window (~1.8 device-ms/rollout at N=4096); an (A, A)
        # ones-triangle on the MXU is ~free for A=64.
        A = w.shape[-1]
        tri = jnp.triu(jnp.ones((A, A), w.dtype))
        c = w @ tri
        u = 1.0 - jax.random.uniform(key, ml.shape[:-1], dtype=c.dtype)
        t = u[..., None] * c[..., -1:]
        action = (c < t).sum(-1)
        return jnp.where(self.any_legal, action, 0).astype(jnp.int32)

    def mode(self) -> jnp.ndarray:
        action = jnp.argmax(self.masked_logits, axis=-1)
        return jnp.where(self.any_legal, action, 0).astype(jnp.int32)

    def log_prob(self, action: jnp.ndarray) -> jnp.ndarray:
        """Log-prob of ``action`` under the legal-subset softmax; 0 when the
        legal set is empty or the action is illegal (evaluate_actions
        fallback, model.py:164-173).

        Selection is one-hot arithmetic, not ``take_along_axis``: on TPU
        the per-row gather costs ~0.55 ms per 64K rows while the masked
        multiply-reduce fuses to ~nothing (scripts/trace_update.py), and
        picking a single element by 0/1 mask is bit-exact."""
        onehot = (action[..., None].astype(jnp.int32)
                  == jnp.arange(self.logits.shape[-1], dtype=jnp.int32))
        logp_all = jax.nn.log_softmax(self.masked_logits, axis=-1)
        logp = jnp.where(onehot, logp_all, 0.0).sum(axis=-1)
        legal_action = (onehot & self.mask).any(axis=-1)
        return jnp.where(self.any_legal & legal_action, logp, 0.0)

    def entropy_full(self) -> jnp.ndarray:
        """Entropy of the unmasked softmax (reference entropy bonus)."""
        logp = jax.nn.log_softmax(self.logits, axis=-1)
        return -(jnp.exp(logp) * logp).sum(axis=-1)

    def entropy_masked(self) -> jnp.ndarray:
        """Entropy of the legal-subset distribution (the principled
        variant; not what the reference optimizes)."""
        logp = jax.nn.log_softmax(self.masked_logits, axis=-1)
        p = jnp.exp(logp)
        ent = -jnp.where(self.mask, p * logp, 0.0).sum(axis=-1)
        return jnp.where(self.any_legal, ent, 0.0)

    def probs_masked(self) -> jnp.ndarray:
        return jax.nn.softmax(self.masked_logits, axis=-1)


_LOG_2PI = 1.8378770664093453


@struct.dataclass
class DiagNormal:
    """Independent Gaussian per action dimension (FixedNormal,
    distributions.py:36-44): ``log_prob``/``entropy`` sum over the action
    dim; ``mode`` is the mean."""
    mean: jnp.ndarray     # (..., D)
    log_std: jnp.ndarray  # (..., D) or broadcastable

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + jnp.exp(self.log_std) * jax.random.normal(
            key, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def log_prob(self, actions: jnp.ndarray) -> jnp.ndarray:
        z = (actions - self.mean) * jnp.exp(-self.log_std)
        per_dim = -0.5 * (z ** 2) - self.log_std - 0.5 * _LOG_2PI
        return per_dim.sum(axis=-1)

    def entropy(self) -> jnp.ndarray:
        per_dim = 0.5 + 0.5 * _LOG_2PI + self.log_std
        return jnp.broadcast_to(per_dim, self.mean.shape).sum(axis=-1)


@struct.dataclass
class BernoulliDist:
    """Independent Bernoulli per output bit (FixedBernoulli,
    distributions.py:48-57): ``log_prob``/``entropy`` sum over the last
    dim; ``mode`` thresholds the probabilities at 0.5."""
    logits: jnp.ndarray   # (..., D)

    def probs(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.logits)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return jax.random.bernoulli(
            key, self.probs(), self.logits.shape).astype(jnp.float32)

    def mode(self) -> jnp.ndarray:
        return (self.probs() > 0.5).astype(jnp.float32)

    def log_prob(self, actions: jnp.ndarray) -> jnp.ndarray:
        # a*log(p) + (1-a)*log(1-p), numerically via log-sigmoid.
        per_dim = (actions * jax.nn.log_sigmoid(self.logits)
                   + (1.0 - actions) * jax.nn.log_sigmoid(-self.logits))
        return per_dim.sum(axis=-1)

    def entropy(self) -> jnp.ndarray:
        p = self.probs()
        per_dim = (jax.nn.softplus(-self.logits) * p
                   + jax.nn.softplus(self.logits) * (1.0 - p))
        return per_dim.sum(axis=-1)
