"""Flax network zoo matching the reference model capabilities.

All models accept NCHW inputs ``(..., C, B, B)`` float32 (the reference's
torch layout, produced by ``core.featurize.make_state``) and transpose to
NHWC internally — the TPU-preferred conv layout.

Families:
  * ``DQNNet`` / ``DuelingDQNNet`` — dqn.py:73-127.
  * ``ActorCriticNet`` — the standalone PPO net (ppo.py:29-77): shared
    conv trunk + fc 256->128, policy head 128->A, value head 128->1.
  * ``PolicyNet`` — the vendored masked ``Policy`` with ``CNNBase``
    (model.py:288-314): conv trunk + fc 256->512, critic 512->1,
    categorical head 512->A, orthogonal init (relu gain trunk, 0.01 dist
    head, 1.0 critic), optional GRU recurrence (model.py:201-285).
  * ``MLPBase`` — 2x64 tanh actor/critic (model.py:317-348).

  * ``DiagGaussianHead`` / ``BernoulliHead`` — the vendored library's
    continuous/binary action heads (distributions.py:75-109).

Conv trunk (shared shape across reference nets): conv(C->32, k3, s2, p1),
conv(32->64, k2, valid), conv(64->64, k2, valid); for B=8 this flattens to
256 features.
"""

from __future__ import annotations

import functools
import math


import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gymothelloenv_tpu.models.distributions import (BernoulliDist,
                                                    DiagNormal,
                                                    MaskedCategorical)


def _to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.moveaxis(x, -3, -1)


def torch_default_init():
    """Kaiming-uniform(a=sqrt(5)) — torch's default Conv/Linear init, for
    variance parity with dqn.py/ppo.py nets."""
    return nn.initializers.variance_scaling(
        1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


@functools.lru_cache(maxsize=None)
def _lift_block_map(h: int, w: int, kh: int, kw: int,
                    stride: int, pad: int):
    """Static index/mask pair for lifting a conv to one dense matmul.

    Returns ``(kyx, valid, ho, wo)`` where ``kyx[p, q]`` is the flat
    kernel-position index ``ky*kw + kx`` connecting input position ``p``
    (row-major ``y*w + x``) to output position ``q`` (``oy*wo + ox``), and
    ``valid[p, q]`` marks pairs actually connected (0 elsewhere; ``kyx``
    is 0 there, masked out after the gather)."""
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (w + 2 * pad - kw) // stride + 1
    kyx = np.zeros((h * w, ho * wo), np.int32)
    valid = np.zeros((h * w, ho * wo), bool)
    for oy in range(ho):
        for ox in range(wo):
            for ky in range(kh):
                iy = oy * stride - pad + ky
                if not 0 <= iy < h:
                    continue
                for kx in range(kw):
                    ix = ox * stride - pad + kx
                    if not 0 <= ix < w:
                        continue
                    kyx[iy * w + ix, oy * wo + ox] = ky * kw + kx
                    valid[iy * w + ix, oy * wo + ox] = True
    return kyx, valid, ho, wo


def _lifted_conv(x, kernel, bias, h: int, w: int, stride: int, pad: int,
                 dtype):
    """Apply a conv as ONE dense matmul on flattened NHWC positions.

    The reference trunk's convs are tiny (channels 4-64 on an 8x8 board)
    — XLA's conv lowering leaves the 128x128 MXU mostly idle on them.
    Lifting scatters the (kh,kw,cin,cout) kernel into a dense
    (h*w*cin, ho*wo*cout) matrix via a cheap block gather (h*w*ho*wo
    blocks <= 1024) and runs ``x @ D``: ~2.5x the FLOPs of the conv but
    MXU-shaped, which is a large net win on TPU (RESULTS.md).  Gradients
    flow through the gather back to the conv kernel, so the param tree —
    and every checkpoint — is identical to the direct path.
    """
    kh, kw, cin, cout = kernel.shape
    kyx, valid, ho, wo = _lift_block_map(h, w, kh, kw, stride, pad)
    blocks = kernel.astype(dtype).reshape(kh * kw, cin * cout)
    dense = blocks[jnp.asarray(kyx.reshape(-1))]          # (h*w*ho*wo, ...)
    dense = dense.reshape(h * w, ho * wo, cin, cout)
    dense = jnp.where(jnp.asarray(valid)[:, :, None, None], dense, 0)
    dense = dense.transpose(0, 2, 1, 3).reshape(h * w * cin,
                                                ho * wo * cout)
    y = x @ dense + jnp.tile(bias.astype(dtype), ho * wo)
    return y, ho, wo


class _ConvParams(nn.Module):
    """Owns one conv layer's kernel/bias under the exact param names/shapes
    ``nn.Conv`` would create, so the lifted trunk shares checkpoints (and
    torch imports) with the direct trunk."""
    features: int
    kernel_size: tuple
    in_features: int
    kernel_init: nn.initializers.Initializer

    @nn.compact
    def __call__(self):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _im2col_conv(x, kernel, bias, stride: int, pad: int, dtype):
    """Apply a conv as im2col patches + one matmul.

    Same math and params as the direct conv; autodiff's kernel gradient
    becomes ``patches^T @ dy`` (a big-K contraction).  NOTE: measured
    ~4.5x slower than the direct conv path on TPU (see ConvTrunk
    docstring) — the tiny strided slices and their transposes cost more
    than the conv-backward they replace.  Retained as an A/B probe.

    ``x``: (B, h, w, cin) NHWC (single leading batch dim).
    """
    kh, kw, cin, cout = kernel.shape
    b, h, w, _ = x.shape
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    ho = (h + 2 * pad - kh) // stride + 1
    wo = (w + 2 * pad - kw) // stride + 1
    cols = [x[:, ky:ky + stride * (ho - 1) + 1:stride,
              kx:kx + stride * (wo - 1) + 1:stride, :]
            for ky in range(kh) for kx in range(kw)]
    patches = jnp.concatenate(cols, axis=-1)      # (B, ho, wo, kh*kw*cin)
    y = (patches.reshape(b * ho * wo, kh * kw * cin)
         @ kernel.astype(dtype).reshape(kh * kw * cin, cout))
    return y.reshape(b, ho, wo, cout) + bias.astype(dtype)


class ConvTrunk(nn.Module):
    """conv(32,k3,s2,p1) -> conv(64,k2) -> conv(64,k2), ReLU between, then
    flatten (dqn.py:84-94 / ppo.py:33-69 / model.py:295-299).

    ``impl`` selects the lowering — all three share the exact same param
    tree (checkpoints interchange freely) and the same math:
      * ``"conv"``: direct ``nn.Conv`` (XLA conv lowering).  **The
        measured winner** on TPU at every dtype — keep it unless
        re-measuring (scripts/bench_lifted_trunk.py).
      * ``"im2col"``: patches + one matmul per layer (``_im2col_conv``).
        Hypothesis was that autodiff's big-K kernel-grad matmuls would
        beat XLA's transposed-conv lowering; measured ~4.5x SLOWER
        (grad 2.9 -> 13.1 ms bf16) — the tiny strided slices and their
        pad/add transposes dominate.  Kept as a documented probe.
      * ``"lifted"``: whole conv as one dense (h·w·cin, ho·wo·cout)
        matmul (``_lifted_conv``) — measured ~15% slower in-scan, kept
        for A/B.
    """
    kernel_init: nn.initializers.Initializer
    dtype: jnp.dtype = jnp.float32
    impl: str = "conv"
    width_mult: int = 1   # channel multiplier (1 = reference-parity
    #   32/64/64 trunk; >1 widens every conv — the strength plateau at
    #   parity capacity is documented in RESULTS.md)

    _BASE_SPECS = ((32, 3, 2, 1), (64, 2, 1, 0), (64, 2, 1, 0))

    @property
    def _specs(self):
        return tuple((c * self.width_mult, k, s, p)
                     for c, k, s, p in self._BASE_SPECS)

    @nn.compact
    def __call__(self, x):
        # x: (..., B, B, C) NHWC
        specs = self._specs
        if self.impl == "conv":
            (c0, k0, s0, p0), (c1, k1, _, _), (c2, k2, _, _) = specs
            x = nn.Conv(c0, (k0, k0), strides=(s0, s0),
                        padding=((p0, p0), (p0, p0)),
                        kernel_init=self.kernel_init, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(c1, (k1, k1), padding="VALID",
                        kernel_init=self.kernel_init, dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Conv(c2, (k2, k2), padding="VALID",
                        kernel_init=self.kernel_init, dtype=self.dtype)(x)
            x = nn.relu(x)
            return x.reshape(x.shape[:-3] + (-1,))

        h, w, cin = x.shape[-3:]
        lead = x.shape[:-3]
        params = [
            _ConvParams(features=cout, kernel_size=(k, k), in_features=ci,
                        kernel_init=self.kernel_init, name=f"Conv_{i}")()
            for i, ((cout, k, stride, pad), ci) in enumerate(
                zip(specs, (cin, specs[0][0], specs[1][0])))]

        if self.impl == "im2col":
            y = x.astype(self.dtype).reshape((-1, h, w, cin))
            for (kernel, bias), (cout, k, stride, pad) in zip(
                    params, specs):
                y = nn.relu(_im2col_conv(y, kernel, bias, stride, pad,
                                         self.dtype))
            return y.reshape(lead + (-1,))

        if self.impl != "lifted":
            raise ValueError(f"unknown ConvTrunk impl: {self.impl!r}")
        y = x.astype(self.dtype).reshape(lead + (h * w * cin,))
        for (kernel, bias), (cout, k, stride, pad) in zip(
                params, specs):
            y, h, w = _lifted_conv(y, kernel, bias, h, w, stride, pad,
                                   self.dtype)
            y = nn.relu(y)
        return y


class DQNNet(nn.Module):
    """Q-network (dqn.py:73-95): trunk -> fc 256->128 -> fc 128->A."""
    num_actions: int

    @nn.compact
    def __call__(self, x):
        x = ConvTrunk(kernel_init=torch_default_init())(_to_nhwc(x))
        x = nn.relu(nn.Dense(128, kernel_init=torch_default_init())(x))
        return nn.Dense(self.num_actions,
                        kernel_init=torch_default_init())(x)


class DuelingDQNNet(nn.Module):
    """Dueling Q-network (dqn.py:97-127): separate advantage/value branches,
    Q = V + A - mean(A)."""
    num_actions: int

    @nn.compact
    def __call__(self, x):
        x = ConvTrunk(kernel_init=torch_default_init())(_to_nhwc(x))
        adv = nn.relu(nn.Dense(128, kernel_init=torch_default_init())(x))
        val = nn.relu(nn.Dense(128, kernel_init=torch_default_init())(x))
        adv = nn.Dense(self.num_actions,
                       kernel_init=torch_default_init())(adv)
        val = nn.Dense(1, kernel_init=torch_default_init())(val)
        return val + adv - adv.mean(axis=-1, keepdims=True)


class ActorCriticNet(nn.Module):
    """Standalone-PPO net (ppo.py:29-77): shared trunk + fc 256->128;
    ``pi`` head (raw logits; reference softmaxes then renormalizes over the
    legal subset — identical to our masked softmax) and value head."""
    num_actions: int

    @nn.compact
    def __call__(self, x):
        x = ConvTrunk(kernel_init=torch_default_init())(_to_nhwc(x))
        h = nn.relu(nn.Dense(128, kernel_init=torch_default_init())(x))
        logits = nn.Dense(self.num_actions,
                          kernel_init=torch_default_init())(h)
        value = nn.Dense(1, kernel_init=torch_default_init())(h)[..., 0]
        return logits, value


class GRUCore(nn.Module):
    """Single-layer GRU with episode-mask resets — NNBase._forward_gru
    (model.py:230-285).  Hidden state is zeroed where ``mask == 0``."""
    hidden_size: int

    @nn.compact
    def __call__(self, x, h, mask):
        h = h * mask[..., None]
        cell = nn.GRUCell(features=self.hidden_size,
                          kernel_init=nn.initializers.orthogonal())
        h, y = cell(h, x)
        return y, h


class PolicyNet(nn.Module):
    """Vendored masked actor-critic ``Policy`` + ``CNNBase``
    (model.py:19-98, :288-314).

    Orthogonal init: relu gain (sqrt(2)) for the trunk/fc, 0.01 for the
    categorical head, 1.0 for the critic (utils.init usage,
    model.py:291-304 + distributions.py:59-74).
    """
    num_actions: int
    hidden_size: int = 512
    recurrent: bool = False
    dtype: jnp.dtype = jnp.float32   # compute dtype; params stay float32.
    #   bfloat16 halves the HBM traffic of the (tiny-channel, bandwidth-
    #   bound) conv trunk on TPU; logits/value are cast back to float32 so
    #   sampling and losses are unaffected downstream.
    trunk_impl: str = "conv"  # conv | im2col | lifted (same params; see
    #   ConvTrunk — "conv" is the measured winner, others are A/B probes)
    width_mult: int = 1       # trunk channel multiplier (1 = parity)

    def setup(self):
        # Explicit names reproduce the @nn.compact auto-naming the round-1
        # checkpoints were saved with (ConvTrunk_0 / Dense_0 fc /
        # GRUCore_0 / Dense_1 value / Dense_2 logits) — round 3 split the
        # forward into (features, core, heads) methods so the recurrent
        # update can batch the trunk over T*N and keep only the GRU in
        # the sequential scan (see agents.ppo.ppo_update_recurrent).
        relu_gain = math.sqrt(2.0)
        trunk_init = nn.initializers.orthogonal(relu_gain)
        self._trunk = ConvTrunk(kernel_init=trunk_init, dtype=self.dtype,
                                impl=self.trunk_impl,
                                width_mult=self.width_mult,
                                name="ConvTrunk_0")
        self._fc = nn.Dense(self.hidden_size, kernel_init=trunk_init,
                            bias_init=nn.initializers.zeros,
                            dtype=self.dtype, name="Dense_0")
        if self.recurrent:
            self._gru = GRUCore(hidden_size=self.hidden_size,
                                name="GRUCore_0")
        self._value = nn.Dense(1,
                               kernel_init=nn.initializers.orthogonal(1.0),
                               bias_init=nn.initializers.zeros,
                               dtype=self.dtype, name="Dense_1")
        self._logits = nn.Dense(self.num_actions,
                                kernel_init=nn.initializers.orthogonal(
                                    0.01),
                                bias_init=nn.initializers.zeros,
                                dtype=self.dtype, name="Dense_2")

    def features(self, x):
        """Everything below the recurrence: trunk + fc -> (N, hidden).
        Batch-parallel (no hidden-state dependence)."""
        x = x.astype(self.dtype)
        x = self._trunk(_to_nhwc(x))
        return nn.relu(self._fc(x))

    def core(self, feat, h, mask):
        """One GRU step over precomputed features -> (y, h')."""
        return self._gru(feat, h, mask)

    def heads(self, y):
        """Value + logits over (post-recurrence) features —
        batch-parallel."""
        value = self._value(y)[..., 0]
        logits = self._logits(y)
        return logits.astype(jnp.float32), value.astype(jnp.float32)

    def __call__(self, x, h=None, mask=None):
        y = self.features(x)
        if self.recurrent:
            if h is None or mask is None:
                raise ValueError("recurrent PolicyNet needs (h, mask)")
            y, h = self.core(y, h, mask)
        logits, value = self.heads(y)
        return logits, value, h


class MLPBase(nn.Module):
    """2x64 tanh actor/critic MLP (model.py:317-348)."""
    num_actions: int
    hidden_size: int = 64

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.orthogonal(math.sqrt(2.0))
        a = x
        for _ in range(2):
            a = jnp.tanh(nn.Dense(self.hidden_size, kernel_init=init)(a))
        c = x
        for _ in range(2):
            c = jnp.tanh(nn.Dense(self.hidden_size, kernel_init=init)(c))
        value = nn.Dense(1, kernel_init=nn.initializers.orthogonal(1.0))(c)
        logits = nn.Dense(self.num_actions,
                          kernel_init=nn.initializers.orthogonal(0.01))(a)
        return logits, value[..., 0]


class DiagGaussianHead(nn.Module):
    """``DiagGaussian`` head (distributions.py:75-96): orthogonal(1.0)
    mean projection + a state-independent learned log-std initialized to
    zero (the reference's ``AddBias`` over zeros)."""
    num_outputs: int

    @nn.compact
    def __call__(self, x):
        mean = nn.Dense(self.num_outputs,
                        kernel_init=nn.initializers.orthogonal(1.0),
                        bias_init=nn.initializers.zeros)(x)
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.num_outputs,))
        return DiagNormal(mean=mean,
                          log_std=jnp.broadcast_to(log_std, mean.shape))


class BernoulliHead(nn.Module):
    """``Bernoulli`` head (distributions.py:99-109): orthogonal(1.0)
    logit projection over independent bits."""
    num_outputs: int

    @nn.compact
    def __call__(self, x):
        logits = nn.Dense(self.num_outputs,
                          kernel_init=nn.initializers.orthogonal(1.0),
                          bias_init=nn.initializers.zeros)(x)
        return BernoulliDist(logits=logits)


def masked_dist(logits: jnp.ndarray, legal: jnp.ndarray) -> MaskedCategorical:
    return MaskedCategorical(logits=logits, mask=legal)
