"""PPO with GAE — the TPU-native rebuild of the vendored update rule
(a2c_ppo_acktr/algo/ppo.py:34-110 + storage.py:73-112).

Everything runs on device: GAE is a reverse ``lax.scan``; the K-epoch
minibatch loop is a ``lax.scan`` over permuted index blocks; gradients flow
through a ``MaskedCategorical`` instead of the reference's per-env Python
choice loops.  For multi-chip data parallelism the same functions run under
``shard_map``/``pjit`` with batch-sharded rollouts (see parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.ops.gather import pack_rows
from gymothelloenv_tpu.ops.shuffle import is_power_of_two, minibatch_indices


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Hyperparameters; defaults are the flagship trainer's hard-coded
    overrides (ppo_run_self_play.py:59-70) over get_args() defaults
    (arguments.py:6-161)."""
    lr: float = 1e-5
    adam_eps: float = 1e-5
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_param: float = 0.1
    ppo_epochs: int = 4
    num_mini_batch: int = 4
    value_loss_coef: float = 0.5
    entropy_coef: float = 0.0
    max_grad_norm: float = 0.5
    use_clipped_value_loss: bool = True
    # Linear LR decay over the expected update count
    # (utils.update_linear_schedule semantics).
    use_linear_lr_decay: bool = True
    num_updates: int = 10000
    # Run Adam on ravel-flattened updates (optax.flatten): mathematically
    # identical (global-norm clip and Adam are elementwise/global either
    # way) but the optimizer state becomes single vectors.  Measured
    # NEUTRAL on-chip (46.2 vs 46.3 ms/update, scripts/bench_flat_opt.py)
    # — XLA's scan-carry handling doesn't care about leaf count here.
    # Changes the opt_state checkpoint structure; kept off.
    flatten_optimizer: bool = False
    # Epoch shuffle mechanism: "hash" evaluates a keyed bijection pointwise
    # per minibatch (no sort, no materialized (T*N,) permutation — saves
    # the 2.2 ms of sorts per update measured at batch 256K,
    # ops/shuffle.py); falls back to the sort-based uniform permutation
    # when T*N is not a power of two.  "sort" forces the uniform
    # permutation everywhere.
    shuffle: str = "hash"
    # Distillation mode (round-4 search-bootstrapped training): replace
    # the clipped surrogate with plain cross-entropy to the TAKEN action
    # (the collector's lookahead-override action), value loss unchanged.
    # With collect-time lookahead acting this is approximate policy
    # iteration: act with search, regress the raw policy onto the
    # searched actions and the value head onto the observed returns.
    distill: bool = False


@struct.dataclass
class Transition:
    """One rollout slot, shapes (T, N, ...) after the collection scan."""
    obs: jnp.ndarray      # (..., C, B, B) featurized planes; collectors
    #                       store int8 ({0,1} planes) to cut minibatch
    #                       gather bandwidth 4x — losses cast to float
    action: jnp.ndarray   # int32
    logp: jnp.ndarray     # float32 behaviour log-prob
    value: jnp.ndarray    # float32 behaviour value estimate
    reward: jnp.ndarray   # float32
    done: jnp.ndarray     # bool — episode ended with this transition
    legal: jnp.ndarray    # bool (..., A) legal mask at sample time


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    if cfg.use_linear_lr_decay:
        schedule = optax.linear_schedule(
            init_value=cfg.lr, end_value=0.0,
            transition_steps=cfg.num_updates * cfg.ppo_epochs
            * cfg.num_mini_batch)
    else:
        schedule = cfg.lr
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adam(schedule, eps=cfg.adam_eps),
    )
    return optax.flatten(opt) if cfg.flatten_optimizer else opt


def compute_gae(rollout: Transition, bootstrap_value: jnp.ndarray,
                cfg: PPOConfig):
    """Returns (advantages, returns), both (T, N).

    Matches storage.py:99-112 (``use_proper_time_limits=False`` — the
    flagship's setting; this trainer has no time limits, so ``bad_masks``
    are always 1 and the proper-time-limit variant is identical).
    ``mask_{t+1} = 1 - done_t`` since ``done`` marks the transition that
    ended its episode.
    """
    next_values = jnp.concatenate(
        [rollout.value[1:], bootstrap_value[None]], axis=0)
    next_mask = 1.0 - rollout.done.astype(jnp.float32)
    deltas = (rollout.reward + cfg.gamma * next_values * next_mask
              - rollout.value)

    def body(gae, inp):
        delta, mask = inp
        gae = delta + cfg.gamma * cfg.gae_lambda * mask * gae
        return gae, gae

    _, adv = jax.lax.scan(body, jnp.zeros_like(bootstrap_value),
                          (deltas, next_mask), reverse=True)
    return adv, adv + rollout.value


def compute_gae_time_limits(rollout: Transition, bad_transition: jnp.ndarray,
                            bootstrap_value: jnp.ndarray, cfg: PPOConfig):
    """GAE with proper time limits (storage.py:79-96,
    ``use_proper_time_limits=True``): the advantage of a transition that
    was cut by a step cap — not by the task — is zeroed, and nothing
    bootstraps backwards through it (``gae = gae * bad_masks[step+1]``).

    ``bad_transition`` is (T, N) bool from ``envs.vec_wrappers.
    time_limit_step`` (the TimeLimitMask ``info['bad_transition']`` flag,
    a2c_ppo_acktr/envs.py:110-119); reference ``bad_masks[t+1]`` is its
    complement.  With ``bad_transition ≡ False`` this equals
    ``compute_gae`` exactly.
    """
    next_values = jnp.concatenate(
        [rollout.value[1:], bootstrap_value[None]], axis=0)
    next_mask = 1.0 - rollout.done.astype(jnp.float32)
    bad_mask = 1.0 - bad_transition.astype(jnp.float32)
    deltas = (rollout.reward + cfg.gamma * next_values * next_mask
              - rollout.value)

    def body(gae, inp):
        delta, mask, bad = inp
        gae = (delta + cfg.gamma * cfg.gae_lambda * mask * gae) * bad
        return gae, gae

    _, adv = jax.lax.scan(body, jnp.zeros_like(bootstrap_value),
                          (deltas, next_mask, bad_mask), reverse=True)
    return adv, adv + rollout.value


def compute_gae_masked(rollout: Transition, weights: jnp.ndarray,
                       bootstrap_value: jnp.ndarray, cfg: PPOConfig):
    """GAE over streams with invalid (weight-0) slots.

    Invalid slots are transparent: the recursion state and the
    successor-value pass through them unchanged, so bubbles (e.g. game-
    boundary gaps in teacher/student role streams) never contaminate the
    advantages of real transitions.  Returns (advantages, returns) — only
    meaningful where ``weights > 0``.
    """
    valid = weights > 0

    def body(carry, inp):
        gae, v_next = carry
        r, v, d, ok = inp
        not_done = 1.0 - d.astype(jnp.float32)
        delta = r + cfg.gamma * v_next * not_done - v
        new_gae = delta + cfg.gamma * cfg.gae_lambda * not_done * gae
        gae = jnp.where(ok, new_gae, gae)
        v_next = jnp.where(ok, v, v_next)
        return (gae, v_next), new_gae

    (_, _), adv = jax.lax.scan(
        body, (jnp.zeros_like(bootstrap_value), bootstrap_value),
        (rollout.reward, rollout.value, rollout.done, valid),
        reverse=True)
    return adv, adv + rollout.value


def ppo_loss(params, apply_fn: Callable, batch: Transition,
             advantages: jnp.ndarray, returns: jnp.ndarray,
             cfg: PPOConfig, weights: jnp.ndarray | None = None):
    """Clipped-surrogate PPO loss on a flat minibatch (algo/ppo.py:50-104).

    ``weights`` (optional, per-sample 0/1) masks padded slots out of every
    term — used by rollouts with stream bubbles (teacher/student)."""
    logits, values, _ = apply_fn(params, batch.obs.astype(jnp.float32))
    return ppo_loss_terms(logits, values, batch, advantages, returns,
                          cfg, weights)


def ppo_loss_terms(logits: jnp.ndarray, values: jnp.ndarray,
                   batch: Transition, advantages: jnp.ndarray,
                   returns: jnp.ndarray, cfg: PPOConfig,
                   weights: jnp.ndarray | None = None):
    """The loss given precomputed network outputs — shared by the
    feed-forward path (``ppo_loss``) and the recurrent path, which
    produces ``logits``/``values`` by replaying a GRU over time."""
    dist = MaskedCategorical(logits=logits, mask=batch.legal)
    logp = dist.log_prob(batch.action)

    if weights is None:
        def wmean(x):
            return x.mean()
    else:
        denom = jnp.maximum(weights.sum(), 1.0)

        def wmean(x):
            return (x * weights).sum() / denom

    if cfg.distill:
        # CE to the taken (search-improved) action; advantages unused.
        action_loss = -wmean(logp)
    else:
        ratio = jnp.exp(logp - batch.logp)
        surr1 = ratio * advantages
        surr2 = jnp.clip(ratio, 1.0 - cfg.clip_param,
                         1.0 + cfg.clip_param) * advantages
        action_loss = -wmean(jnp.minimum(surr1, surr2))

    if cfg.use_clipped_value_loss:
        value_clipped = batch.value + jnp.clip(
            values - batch.value, -cfg.clip_param, cfg.clip_param)
        value_loss = 0.5 * wmean(jnp.maximum(
            (values - returns) ** 2, (value_clipped - returns) ** 2))
    else:
        value_loss = 0.5 * wmean((returns - values) ** 2)

    # Reference entropy bonus uses the UNMASKED softmax entropy
    # (model.py:178-179).
    entropy = wmean(dist.entropy_full())

    total = (value_loss * cfg.value_loss_coef + action_loss
             - entropy * cfg.entropy_coef)
    return total, {"value_loss": value_loss, "action_loss": action_loss,
                   "entropy": entropy}


def ppo_update(params, opt_state, rollout: Transition,
               bootstrap_value: jnp.ndarray, key: jax.Array,
               apply_fn: Callable, optimizer: optax.GradientTransformation,
               cfg: PPOConfig, grad_reduce: Callable | None = None,
               weights: jnp.ndarray | None = None,
               bad_transition: jnp.ndarray | None = None):
    """One full PPO update: GAE + advantage normalization + K epochs of
    shuffled minibatches (algo/ppo.py:34-110).

    ``grad_reduce`` (e.g. ``lambda g: lax.pmean(g, 'data')``) hooks in
    multi-chip gradient reduction when run under shard_map.
    ``weights`` (optional (T, N) 0/1) masks padded rollout slots.
    ``bad_transition`` (optional (T, N) bool, exclusive with
    ``weights``) switches GAE to the proper-time-limit variant
    (``compute_gae_time_limits``, storage.py:79-96) — fed by
    ``collect_rollout_time_limited``.
    Returns (params, opt_state, metrics).
    """
    if bad_transition is not None:
        if weights is not None:
            raise ValueError("weights and bad_transition are exclusive")
        adv, returns = compute_gae_time_limits(rollout, bad_transition,
                                               bootstrap_value, cfg)
        adv = (adv - adv.mean()) / (adv.std() + 1e-5)
    elif weights is None:
        adv, returns = compute_gae(rollout, bootstrap_value, cfg)
        adv = (adv - adv.mean()) / (adv.std() + 1e-5)
    else:
        adv, returns = compute_gae_masked(rollout, weights,
                                          bootstrap_value, cfg)
        denom = jnp.maximum(weights.sum(), 1.0)
        mean = (adv * weights).sum() / denom
        var = (((adv - mean) ** 2) * weights).sum() / denom
        adv = (adv - mean) / (jnp.sqrt(var) + 1e-5)

    T, N = rollout.reward.shape
    batch_size = T * N
    mb_size = batch_size // cfg.num_mini_batch

    flat = jax.tree.map(
        lambda x: x.reshape((batch_size,) + x.shape[2:]), rollout)

    # Byte-pack every per-sample tensor the loss consumes, so each
    # minibatch step issues ONE row gather instead of ~9 — on TPU each
    # 64K-row gather costs ~0.55 ms regardless of row width, and the
    # per-leaf gathers were 61% of the update's device time
    # (scripts/trace_update.py).  reward/done are not used by the loss
    # and are not packed.
    pack_src = {"obs": flat.obs, "action": flat.action, "logp": flat.logp,
                "value": flat.value, "legal": flat.legal,
                "adv": adv.reshape(-1), "ret": returns.reshape(-1)}
    if weights is not None:
        pack_src["w"] = weights.reshape(-1)
    packed, unpack = pack_rows(pack_src)
    zero_reward = jnp.zeros((mb_size,), rollout.reward.dtype)
    zero_done = jnp.zeros((mb_size,), rollout.done.dtype)

    use_hash = cfg.shuffle == "hash" and is_power_of_two(batch_size)

    def epoch(carry, epoch_key):
        params, opt_state = carry
        perm = (None if use_hash
                else jax.random.permutation(epoch_key, batch_size))

        def minibatch(carry, mb_idx):
            params, opt_state = carry
            if use_hash:
                idx = minibatch_indices(epoch_key, batch_size, mb_idx,
                                        mb_size)
            else:
                idx = jax.lax.dynamic_slice_in_dim(perm, mb_idx * mb_size,
                                                   mb_size)
            d = unpack(packed[idx])
            mb = Transition(obs=d["obs"], action=d["action"],
                            logp=d["logp"], value=d["value"],
                            reward=zero_reward, done=zero_done,
                            legal=d["legal"])
            grads, metrics = jax.grad(ppo_loss, has_aux=True)(
                params, apply_fn, mb, d["adv"], d["ret"], cfg,
                d.get("w"))
            if grad_reduce is not None:
                grads = grad_reduce(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            minibatch, (params, opt_state),
            jnp.arange(cfg.num_mini_batch))
        return (params, opt_state), metrics

    (params, opt_state), metrics = jax.lax.scan(
        epoch, (params, opt_state),
        jax.random.split(key, cfg.ppo_epochs))
    metrics = jax.tree.map(lambda m: m.mean(), metrics)
    return params, opt_state, metrics


def ppo_update_recurrent(params, opt_state, rollout: Transition,
                         h0: jnp.ndarray, masks: jnp.ndarray,
                         bootstrap_value: jnp.ndarray, key: jax.Array,
                         apply_fn: Callable,
                         optimizer: optax.GradientTransformation,
                         cfg: PPOConfig,
                         grad_reduce: Callable | None = None,
                         split_fns: tuple | None = None):
    """Recurrent PPO update — the vendored ``recurrent_generator`` path
    (storage.py:159-216 driven by algo/ppo.py:41-48 with
    ``recurrent_hidden_state_size > 1``), rebuilt working.

    Minibatches are ENV subsets (``N // num_mini_batch`` envs each,
    storage.py:160-170); every grad step replays the recurrent core over
    the full ``T`` steps from each env's rollout-start hidden state,
    zeroing the state where ``masks == 0`` (episode boundaries,
    ``NNBase._forward_gru`` model.py:230-285).

    NOTE: the fork hard-errors on this path for masked actions
    (algo/ppo.py:44-46 ``raise ValueError('Not available with possible
    actions now.')``) because its per-env Python choices lists cannot be
    re-batched; our batched ``MaskedCategorical`` has no such limit, so
    legal-move masking works here (rebuilt+fixed divergence).

    Args:
      rollout: (T, N, ...) transitions.
      h0: (N, H) hidden states at the rollout's first step.
      masks: (T, N) float 0/1 — 0 resets the hidden state BEFORE step t
        consumes obs[t] (i.e. ``masks[t] = 1 - done[t-1]``, masks[0]
        refers to the validity of ``h0``).
      apply_fn: ``(params, obs_t, h, mask_t) -> (logits, value, h)``.
      split_fns: optional ``(features, core, heads)`` decomposition of
        ``apply_fn`` (``PolicyNet.features/core/heads``).  When given,
        the replay computes trunk features for ALL ``T * envs_mb`` rows
        in ONE parallel batch and keeps only the tiny GRU recurrence in
        the sequential ``T``-scan — the same math (the trunk has no
        hidden-state dependence), but the conv/fc FLOPs hit the MXU as
        one large matmul instead of ``T`` sequential small ones.  This
        was the recurrent path's whole throughput gap: the round-2
        update serialized the full CNN ``T`` times per grad step
        (RESULTS.md round-3 trace).
    """
    adv, returns = compute_gae(rollout, bootstrap_value, cfg)
    adv = (adv - adv.mean()) / (adv.std() + 1e-5)

    T, N = rollout.reward.shape
    if N % cfg.num_mini_batch:
        raise ValueError(
            f"num_envs ({N}) must divide by num_mini_batch "
            f"({cfg.num_mini_batch}) for the recurrent generator")
    envs_mb = N // cfg.num_mini_batch

    def epoch(carry, epoch_key):
        params, opt_state = carry
        perm = jax.random.permutation(epoch_key, N)

        def minibatch(carry, mb_idx):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, mb_idx * envs_mb,
                                               envs_mb)
            mb = jax.tree.map(lambda x: jnp.take(x, idx, axis=1), rollout)
            mb_adv = jnp.take(adv, idx, axis=1).reshape(-1)
            mb_ret = jnp.take(returns, idx, axis=1).reshape(-1)
            mb_h0 = h0[idx]
            mb_masks = jnp.take(masks, idx, axis=1)

            def loss_fn(params):
                obs = mb.obs.astype(jnp.float32)
                flat = jax.tree.map(
                    lambda x: x.reshape((T * envs_mb,) + x.shape[2:]), mb)

                if split_fns is not None:
                    features, core, heads = split_fns
                    # Trunk over all T*envs_mb rows at once (MXU-sized);
                    # only the GRU cell stays sequential-in-T.
                    feats = features(
                        params,
                        obs.reshape((T * envs_mb,) + obs.shape[2:]))
                    feats = feats.reshape(T, envs_mb, -1)

                    def step(h, inp):
                        feat_t, mask_t = inp
                        y_t, h = core(params, feat_t, h, mask_t)
                        return h, y_t

                    _, ys = jax.lax.scan(step, mb_h0, (feats, mb_masks))
                    logits, values = heads(
                        params, ys.reshape(T * envs_mb, -1))
                    return ppo_loss_terms(
                        logits, values, flat, mb_adv, mb_ret, cfg, None)

                def step(h, inp):
                    obs_t, mask_t = inp
                    logits_t, value_t, h = apply_fn(params, obs_t, h,
                                                    mask_t)
                    return h, (logits_t, value_t)

                _, (logits, values) = jax.lax.scan(
                    step, mb_h0, (obs, mb_masks))
                return ppo_loss_terms(
                    logits.reshape(T * envs_mb, -1), values.reshape(-1),
                    flat, mb_adv, mb_ret, cfg, None)

            grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
            if grad_reduce is not None:
                grads = grad_reduce(grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), metrics

        (params, opt_state), metrics = jax.lax.scan(
            minibatch, (params, opt_state),
            jnp.arange(cfg.num_mini_batch))
        return (params, opt_state), metrics

    (params, opt_state), metrics = jax.lax.scan(
        epoch, (params, opt_state),
        jax.random.split(key, cfg.ppo_epochs))
    metrics = jax.tree.map(lambda m: m.mean(), metrics)
    return params, opt_state, metrics
