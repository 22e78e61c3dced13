"""Vectorized-env wrapper stack: running normalization, frame stacking,
time limits — the live TPU-native rebuild of the reference's vendored
vec-env pipeline (a2c_ppo_acktr/envs.py:75-250), which is DEAD in the
reference snapshot (every class there depends on the empty ``baselines``
submodule; SURVEY.md §2.2 "Vec-env stack").

Design: each wrapper is a pure function over an explicit state pytree, so
any of them compose inside a jitted rollout scan.  There are no classes
holding mutable tensors (VecPyTorchFrameStack's ``self.stacked_obs``,
VecNormalize's ``self.ret``) — the state threads through the scan carry.

Semantics reproduced:
- ``RunningMeanStd`` (baselines ``running_mean_std``, imported at
  a2c_ppo_acktr/envs.py via VecNormalize and algo/gail.py:9): parallel
  (Chan) moment merge of batch statistics into running mean/var/count.
- ``VecNormalize`` (a2c_ppo_acktr/envs.py:185-205 + its baselines base):
  obs filter ``clip((obs - mean)/sqrt(var + eps), ±clipob)`` whose running
  stats update only in training mode (the fork's ``train()``/``eval()``
  toggle, envs.py:201-205); reward scaled by the running std of the
  per-env discounted return ``ret = ret*gamma + r`` (reset on done),
  clipped to ±cliprew.
- ``VecPyTorchFrameStack`` (a2c_ppo_acktr/envs.py:210-250): channel-axis
  ring of the last ``nstack`` observations, zeroed per-env on done before
  the newest frame is written (envs.py:232-238).
- ``TimeLimitMask`` (a2c_ppo_acktr/envs.py:110-119): flags a done that was
  caused by the step cap rather than the task (``info['bad_transition']``),
  consumed by the proper-time-limit GAE
  (``agents.ppo.compute_gae_time_limits``, storage.py:79-96).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

# ---------------------------------------------------------------------------
# Running mean/std (baselines RunningMeanStd, parallel-variance merge)
# ---------------------------------------------------------------------------


@struct.dataclass
class RunningMeanStd:
    mean: jnp.ndarray   # (*shape,)
    var: jnp.ndarray    # (*shape,)
    count: jnp.ndarray  # scalar


def rms_init(shape=(), epsilon: float = 1e-4,
             dtype=jnp.float32) -> RunningMeanStd:
    return RunningMeanStd(mean=jnp.zeros(shape, dtype),
                          var=jnp.ones(shape, dtype),
                          count=jnp.asarray(epsilon, dtype))


def rms_update(rms: RunningMeanStd, batch: jnp.ndarray) -> RunningMeanStd:
    """Merge a (N, *shape) batch into the running moments (Chan's parallel
    algorithm, exactly the baselines ``update_from_moments`` arithmetic)."""
    batch = batch.astype(rms.mean.dtype)
    batch_mean = batch.mean(axis=0)
    batch_var = batch.var(axis=0)
    batch_count = jnp.asarray(batch.shape[0], rms.mean.dtype)

    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * batch_count / tot
    m_a = rms.var * rms.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + jnp.square(delta) * rms.count * batch_count / tot
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)


def rms_update_masked(rms: RunningMeanStd, batch: jnp.ndarray,
                      weights: jnp.ndarray) -> RunningMeanStd:
    """``rms_update`` over only the rows with ``weights > 0`` (static shape:
    zero-weight rows contribute nothing).  Used when a lockstep batch has
    padded / already-done slots."""
    w = weights.astype(rms.mean.dtype)
    w = w.reshape(w.shape + (1,) * (batch.ndim - w.ndim))
    batch = batch.astype(rms.mean.dtype)
    batch_count = jnp.maximum(w.sum(axis=0).reshape(()), 1e-8)
    batch_mean = (batch * w).sum(axis=0) / batch_count
    batch_var = (jnp.square(batch - batch_mean) * w).sum(axis=0) / batch_count

    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * batch_count / tot
    m2 = (rms.var * rms.count + batch_var * batch_count
          + jnp.square(delta) * rms.count * batch_count / tot)
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)


def rms_normalize(rms: RunningMeanStd, x: jnp.ndarray,
                  clip: float = 10.0, eps: float = 1e-8) -> jnp.ndarray:
    """``clip((x - mean)/sqrt(var + eps), ±clip)`` (envs.py:189-196)."""
    out = (x - rms.mean) / jnp.sqrt(rms.var + eps)
    return jnp.clip(out, -clip, clip)


# ---------------------------------------------------------------------------
# VecNormalize (obs filter + return-scaled rewards), functional
# ---------------------------------------------------------------------------


@struct.dataclass
class VecNormState:
    ob_rms: RunningMeanStd    # stats over obs (*obs_shape)
    ret_rms: RunningMeanStd   # stats over the scalar discounted return
    ret: jnp.ndarray          # (N,) per-env running discounted return
    gamma: float = struct.field(pytree_node=False, default=0.99)
    clipob: float = struct.field(pytree_node=False, default=10.0)
    cliprew: float = struct.field(pytree_node=False, default=10.0)
    eps: float = struct.field(pytree_node=False, default=1e-8)


def vecnorm_init(obs_shape, num_envs: int, gamma: float = 0.99,
                 clipob: float = 10.0, cliprew: float = 10.0,
                 eps: float = 1e-8) -> VecNormState:
    return VecNormState(ob_rms=rms_init(obs_shape),
                        ret_rms=rms_init(()),
                        ret=jnp.zeros((num_envs,), jnp.float32),
                        gamma=gamma, clipob=clipob, cliprew=cliprew, eps=eps)


def vecnorm_obs(state: VecNormState, obs: jnp.ndarray,
                training: bool = True):
    """The fork's ``_obfilt`` (envs.py:189-196): update stats only in
    training mode, always normalize.  ``training`` must be static under
    jit (it is a Python bool config, as in the reference)."""
    ob_rms = rms_update(state.ob_rms, obs) if training else state.ob_rms
    return (state.replace(ob_rms=ob_rms),
            rms_normalize(ob_rms, obs, state.clipob, state.eps))


def vecnorm_reward(state: VecNormState, reward: jnp.ndarray,
                   done: jnp.ndarray, training: bool = True):
    """baselines VecNormalize.step_wait reward path: track the discounted
    return, scale the reward by its running std (mean NOT subtracted),
    zero the return on done."""
    ret = state.ret * state.gamma + reward
    ret_rms = rms_update(state.ret_rms, ret) if training else state.ret_rms
    norm_rew = jnp.clip(reward / jnp.sqrt(ret_rms.var + state.eps),
                        -state.cliprew, state.cliprew)
    ret = jnp.where(done, 0.0, ret)
    return state.replace(ret_rms=ret_rms, ret=ret), norm_rew


# ---------------------------------------------------------------------------
# Frame stack (channel axis), functional
# ---------------------------------------------------------------------------


@struct.dataclass
class FrameStackState:
    stacked: jnp.ndarray  # (N, nstack*C, *rest)
    nstack: int = struct.field(pytree_node=False, default=4)


def frame_stack_init(obs: jnp.ndarray, nstack: int) -> FrameStackState:
    """``reset`` of VecPyTorchFrameStack (envs.py:244-249): zeros with the
    newest frame in the last C channels."""
    n, c = obs.shape[0], obs.shape[1]
    stacked = jnp.zeros((n, nstack * c) + obs.shape[2:], obs.dtype)
    stacked = stacked.at[:, -c:].set(obs)
    return FrameStackState(stacked=stacked, nstack=nstack)


def frame_stack_step(state: FrameStackState, obs: jnp.ndarray,
                     done: jnp.ndarray) -> FrameStackState:
    """``step_wait`` (envs.py:231-238): shift left by C channels, zero the
    whole stack for envs whose episode just reset, write the new frame."""
    c = obs.shape[1]
    shifted = jnp.concatenate(
        [state.stacked[:, c:], jnp.zeros_like(state.stacked[:, :c])], axis=1)
    keep = ~done.reshape((-1,) + (1,) * (shifted.ndim - 1))
    shifted = jnp.where(keep, shifted, 0)
    return state.replace(stacked=shifted.at[:, -c:].set(obs))


# ---------------------------------------------------------------------------
# Time limits
# ---------------------------------------------------------------------------


@struct.dataclass
class TimeLimitState:
    elapsed: jnp.ndarray  # int32 (N,)
    max_steps: int = struct.field(pytree_node=False, default=1000)


def time_limit_init(num_envs: int, max_steps: int) -> TimeLimitState:
    return TimeLimitState(elapsed=jnp.zeros((num_envs,), jnp.int32),
                          max_steps=max_steps)


def time_limit_step(state: TimeLimitState, env_done: jnp.ndarray):
    """Apply gym's TimeLimit + the fork's TimeLimitMask (envs.py:110-119):
    returns (state', done, bad_transition) where ``done`` adds truncation
    at ``max_steps`` and ``bad_transition`` marks exactly the dones caused
    by the cap (true even if the task also ended on that step, matching
    ``_max_episode_steps == _elapsed_steps``)."""
    elapsed = state.elapsed + 1
    truncated = elapsed >= state.max_steps
    done = env_done | truncated
    elapsed = jnp.where(done, 0, elapsed)
    return state.replace(elapsed=elapsed), done, truncated
