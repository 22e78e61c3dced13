"""GAIL — rebuild of the vendored ``algo/gail.py``.

The reference's GAIL is a dead path in its snapshot (the empty baselines
submodule kills its ``RunningMeanStd`` import, SURVEY.md §2.2); this is a
WORKING JAX equivalent:

  * ``Discriminator``: tanh MLP over [state, action] pairs (gail.py:12-28)
    trained with BCE (expert=1, policy=0) + WGAN-GP-style mixup gradient
    penalty (gail.py:32-57, lambda=10), Adam defaults.
  * ``predict_reward``: ``log s - log(1 - s)`` normalized by the running
    std of the discounted return accumulator (gail.py:98-111) — the
    RunningMeanStd rebuilt here.
  * ``ExpertDataset``: trajectory container with per-trajectory random
    phase subsampling (gail.py:114-167), loading from .npz instead of
    torch .pt files.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct


class Discriminator(nn.Module):
    """tanh MLP trunk -> scalar logit (gail.py:18-22)."""
    hidden_dim: int = 100

    @nn.compact
    def __call__(self, x):
        x = jnp.tanh(nn.Dense(self.hidden_dim)(x))
        x = jnp.tanh(nn.Dense(self.hidden_dim)(x))
        return nn.Dense(1)(x)[..., 0]


@struct.dataclass
class RunningMeanStd:
    """baselines.common.running_mean_std semantics (parallel-variance
    merge)."""
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray

    @classmethod
    def create(cls):
        return cls(mean=jnp.float32(0.0), var=jnp.float32(1.0),
                   count=jnp.float32(1e-4))

    def update(self, batch: jnp.ndarray) -> "RunningMeanStd":
        b_mean = batch.mean()
        b_var = batch.var()
        b_count = jnp.float32(batch.size)
        delta = b_mean - self.mean
        tot = self.count + b_count
        new_mean = self.mean + delta * b_count / tot
        m_a = self.var * self.count
        m_b = b_var * b_count
        m2 = m_a + m_b + delta ** 2 * self.count * b_count / tot
        return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)


@struct.dataclass
class GAILState:
    params: dict
    opt_state: tuple
    returns: jnp.ndarray      # discounted reward accumulator (N,)
    ret_rms: RunningMeanStd


@dataclasses.dataclass(frozen=True)
class GAILConfig:
    hidden_dim: int = 100
    grad_pen_lambda: float = 10.0
    gamma: float = 0.99


def gail_init(cfg: GAILConfig, input_dim: int, num_envs: int,
              key: jax.Array) -> GAILState:
    disc = Discriminator(hidden_dim=cfg.hidden_dim)
    params = disc.init(key, jnp.zeros((1, input_dim)))
    opt = optax.adam(1e-3)
    return GAILState(params=params, opt_state=opt.init(params),
                     returns=jnp.zeros((num_envs,)),
                     ret_rms=RunningMeanStd.create())


def _apply(cfg: GAILConfig, params, x):
    return Discriminator(hidden_dim=cfg.hidden_dim).apply(params, x)


def gail_discriminator_update(state: GAILState, cfg: GAILConfig,
                              expert_sa: jnp.ndarray,
                              policy_sa: jnp.ndarray, key: jax.Array):
    """One discriminator step: BCE(expert->1, policy->0) + mixup gradient
    penalty (gail.py:60-96).  ``*_sa`` are flattened [state, action]
    batches of equal size."""
    opt = optax.adam(1e-3)

    def loss_fn(params):
        d_expert = _apply(cfg, params, expert_sa)
        d_policy = _apply(cfg, params, policy_sa)
        expert_loss = optax.sigmoid_binary_cross_entropy(
            d_expert, jnp.ones_like(d_expert)).mean()
        policy_loss = optax.sigmoid_binary_cross_entropy(
            d_policy, jnp.zeros_like(d_policy)).mean()

        alpha = jax.random.uniform(key, (expert_sa.shape[0], 1))
        mix = alpha * expert_sa + (1 - alpha) * policy_sa

        def disc_sum(x):
            return _apply(cfg, params, x).sum()

        grads_x = jax.grad(disc_sum)(mix)
        gp = cfg.grad_pen_lambda * (
            (jnp.linalg.norm(grads_x, axis=1) - 1.0) ** 2).mean()
        return expert_loss + policy_loss + gp

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=opt_state), loss


def gail_predict_reward(state: GAILState, cfg: GAILConfig,
                        sa: jnp.ndarray, masks: jnp.ndarray,
                        update_rms: bool = True):
    """log s - log(1-s), normalized by running return std
    (gail.py:98-111).  ``sa`` (N, D), ``masks`` (N,) = 1 - done_prev.
    Returns (state, rewards (N,))."""
    d = _apply(cfg, state.params, sa)
    s = jax.nn.sigmoid(d)
    reward = jnp.log(s + 1e-8) - jnp.log(1 - s + 1e-8)
    returns = state.returns * masks * cfg.gamma + reward
    ret_rms = state.ret_rms.update(returns) if update_rms \
        else state.ret_rms
    new_state = state.replace(returns=returns, ret_rms=ret_rms)
    return new_state, reward / jnp.sqrt(ret_rms.var + 1e-8)


def _load_trajectories(file_name: str):
    """npz with 'states'/'actions'/'lengths', or raw h5 in the reference's
    schema (obs_B_T_Do / a_B_T_Da / len_B — the input of
    gail_experts/convert_to_pytorch.py:29-47)."""
    if file_name.endswith((".h5", ".hdf5")):
        import h5py
        with h5py.File(file_name, "r") as f:
            return {"states": np.asarray(f["obs_B_T_Do"]),
                    "actions": np.asarray(f["a_B_T_Da"]),
                    "lengths": np.asarray(f["len_B"])}
    return np.load(file_name)


class ExpertDataset:
    """Trajectory container with random-phase subsampling
    (gail.py:114-167).  Loads .npz with arrays 'states' (K, T, D),
    'actions' (K, T, ...), 'lengths' (K,), or the reference's raw .h5
    trajectory files directly (no conversion step needed)."""

    def __init__(self, file_name: str, num_trajectories: int = 4,
                 subsample_frequency: int = 20, seed: int = 0):
        data = _load_trajectories(file_name)
        rng = np.random.RandomState(seed)
        K = data["states"].shape[0]
        idx = rng.permutation(K)[:num_trajectories]
        starts = rng.randint(0, subsample_frequency,
                             size=num_trajectories)
        self.states, self.actions, lengths = [], [], []
        for j, i in enumerate(idx):
            s = data["states"][i, starts[j]::subsample_frequency]
            a = data["actions"][i, starts[j]::subsample_frequency]
            n = int(data["lengths"][i]) // subsample_frequency
            self.states.append(s[:n])
            self.actions.append(a[:n])
            lengths.append(n)
        self.states = np.concatenate(self.states)
        self.actions = np.concatenate(self.actions)
        self.length = int(np.sum(lengths))

    def __len__(self):
        return self.length

    def sample(self, rng: np.random.RandomState, batch_size: int):
        idx = rng.randint(0, self.length, batch_size)
        return self.states[idx], self.actions[idx]
