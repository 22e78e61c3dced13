"""Import reference torch checkpoints into this framework's flax nets.

The reference persists torch modules — ``util.save`` stores
``model_state_dict`` dicts (util.py:9-25), the vectorized drivers
``torch.save`` the whole ``actor_critic`` module
(ppo_run_self_play.py:218-223) — and a user switching frameworks needs
those weights here.  Every reference net has an architecture-exact flax
rebuild (models/nets.py), so conversion is a pure re-layout:

  * conv weights: torch OIHW -> flax HWIO,
  * linear weights: torch (out, in) -> flax (in, out),
  * the conv->fc boundary: torch flattens NCHW activations in (C, H, W)
    order while the flax trunks flatten NHWC in (H, W, C) order, so the
    first linear's input rows are permuted accordingly.

Supported: the vendored masked ``Policy`` with CNNBase (model.py:288-314)
-> ``PolicyNet``; ``DQN``/``Dueling_DQN`` (dqn.py:73-127) -> ``DQNNet``/
``DuelingDQNNet``; the standalone PPO ``ActorCritic`` (ppo.py:29-108)
-> ``ActorCriticNet``.  Forward-output equivalence is proven in
tests/test_torch_import.py against live torch modules.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _np(t):
    """torch tensor / array-like -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _flatten_perm(h: int, w: int, c: int) -> np.ndarray:
    """Row permutation for the first post-conv linear: entry ``f`` is the
    torch flat index (C-major) feeding flax flat position ``f``
    (H, W, C order)."""
    idx = np.arange(c * h * w).reshape(c, h, w)   # torch (C, H, W) order
    return idx.transpose(1, 2, 0).reshape(-1)     # read in (H, W, C) order


def _conv(sd: dict, key: str) -> dict:
    return {"kernel": jnp.asarray(_np(sd[f"{key}.weight"])
                                  .transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(_np(sd[f"{key}.bias"]))}


def _linear(sd: dict, key: str, perm: np.ndarray | None = None) -> dict:
    kernel = _np(sd[f"{key}.weight"]).T           # (in, out)
    if perm is not None:
        kernel = kernel[perm]
    return {"kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(_np(sd[f"{key}.bias"]))}


def _state_dict(obj) -> dict:
    """Normalize torch.load results: a module, a ``util.save`` checkpoint
    dict, or a bare state_dict."""
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    if "model_state_dict" in obj:                 # util.py:9-17 layout
        obj = obj["model_state_dict"]
    return dict(obj)


def _trunk_and_perm(sd: dict, conv_keys, board_size: int = 8):
    trunk = {f"Conv_{i}": _conv(sd, k) for i, k in enumerate(conv_keys)}
    # Trunk output spatial dims for B=8: 4 -> 3 -> 2.
    s = (board_size + 1) // 2 - 2
    return trunk, _flatten_perm(s, s, 64)


def import_policy_net(obj) -> dict:
    """Vendored ``Policy`` (base.main convs + critic_linear + dist.linear,
    model.py:288-314) -> ``PolicyNet`` params."""
    sd = _state_dict(obj)
    trunk, perm = _trunk_and_perm(
        sd, ["base.main.0", "base.main.2", "base.main.4"])
    return {"params": {
        "ConvTrunk_0": trunk,
        "Dense_0": _linear(sd, "base.main.7", perm),
        "Dense_1": _linear(sd, "base.critic_linear"),
        "Dense_2": _linear(sd, "dist.linear"),
    }}


def import_dqn_net(obj) -> dict:
    """``DQN`` (dqn.py:73-95) -> ``DQNNet`` params."""
    sd = _state_dict(obj)
    trunk, perm = _trunk_and_perm(sd, ["conv1", "conv2", "conv3"])
    return {"params": {
        "ConvTrunk_0": trunk,
        "Dense_0": _linear(sd, "fc4", perm),
        "Dense_1": _linear(sd, "fc5"),
    }}


def import_dueling_dqn_net(obj) -> dict:
    """``Dueling_DQN`` (dqn.py:97-127) -> ``DuelingDQNNet`` params."""
    sd = _state_dict(obj)
    trunk, perm = _trunk_and_perm(sd, ["conv1", "conv2", "conv3"])
    return {"params": {
        "ConvTrunk_0": trunk,
        "Dense_0": _linear(sd, "fc1_adv", perm),
        "Dense_1": _linear(sd, "fc1_val", perm),
        "Dense_2": _linear(sd, "fc2_adv"),
        "Dense_3": _linear(sd, "fc2_val"),
    }}


def import_actor_critic(obj) -> dict:
    """Standalone PPO ``ActorCritic`` (ppo.py:29-108: conv1-3, fc4 shared,
    fc5 policy head, fc6 value head) -> ``ActorCriticNet`` params."""
    sd = _state_dict(obj)
    trunk, perm = _trunk_and_perm(sd, ["conv1", "conv2", "conv3"])
    return {"params": {
        "ConvTrunk_0": trunk,
        "Dense_0": _linear(sd, "fc4", perm),
        "Dense_1": _linear(sd, "fc5"),
        "Dense_2": _linear(sd, "fc6"),
    }}


def load_torch_checkpoint(path: str):
    """``torch.load`` a reference checkpoint file (full module or
    util.save dict) for one of the ``import_*`` functions."""
    import torch
    return torch.load(path, map_location="cpu", weights_only=False)


def _inv_perm(perm: np.ndarray) -> np.ndarray:
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    return inv


def export_policy_net(params, board_size: int = 8) -> dict:
    """The reverse direction: flax ``PolicyNet`` params -> a state_dict
    (numpy values) loadable by the reference's vendored ``Policy``
    (model.py:288-314) with ``strict=False`` — users can take models
    trained here back to the original code.  Exact inverse of
    ``import_policy_net`` (round-trip tested)."""
    p = params["params"]
    trunk = p["ConvTrunk_0"]
    sd = {}
    for i, key in enumerate(["base.main.0", "base.main.2", "base.main.4"]):
        sd[f"{key}.weight"] = np.asarray(
            trunk[f"Conv_{i}"]["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{key}.bias"] = np.asarray(trunk[f"Conv_{i}"]["bias"])
    s = (board_size + 1) // 2 - 2
    inv = _inv_perm(_flatten_perm(s, s, 64))
    sd["base.main.7.weight"] = np.asarray(
        p["Dense_0"]["kernel"])[inv].T.copy()
    sd["base.main.7.bias"] = np.asarray(p["Dense_0"]["bias"])
    sd["base.critic_linear.weight"] = np.asarray(
        p["Dense_1"]["kernel"]).T.copy()
    sd["base.critic_linear.bias"] = np.asarray(p["Dense_1"]["bias"])
    sd["dist.linear.weight"] = np.asarray(p["Dense_2"]["kernel"]).T.copy()
    sd["dist.linear.bias"] = np.asarray(p["Dense_2"]["bias"])
    return sd


def detect_and_import(obj):
    """Identify which reference architecture a checkpoint holds (by its
    state_dict key layout) and convert it.  Returns ``(kind, params)``
    with kind in {'policy', 'actor_critic', 'dueling_dqn', 'dqn'}."""
    sd = _state_dict(obj)
    if "base.main.0.weight" in sd:
        return "policy", import_policy_net(sd)
    if "fc1_adv.weight" in sd:
        return "dueling_dqn", import_dueling_dqn_net(sd)
    if "fc6.weight" in sd:
        return "actor_critic", import_actor_critic(sd)
    if "fc5.weight" in sd:
        return "dqn", import_dqn_net(sd)
    raise ValueError(
        "unrecognized checkpoint layout; keys: "
        + ", ".join(sorted(sd)[:8]) + " ...")


def imported_apply_fn(kind: str, cfg):
    """Collector-protocol ``apply_fn(params, obs4) -> (logits, value,
    aux)`` for an imported checkpoint of any supported architecture
    (``detect_and_import`` kinds).  ``obs4`` is the 4-plane make_state
    layout; DQN kinds recover board+turn from it, refeaturize to their
    3-plane input, and return sharpened Q-values as near-deterministic
    logits (greedy-over-legal-Q test behavior, dqn.py:478-488).  Used by
    cli/eval_checkpoint.py and cli/replay.py."""
    if kind == "policy":
        from gymothelloenv_tpu.models import PolicyNet
        net = PolicyNet(num_actions=cfg.num_actions)
        return lambda p, obs: net.apply(p, obs)
    if kind == "actor_critic":
        from gymothelloenv_tpu.models import ActorCriticNet
        net = ActorCriticNet(num_actions=cfg.num_actions)

        def ac_apply(p, obs):
            logits, value = net.apply(p, obs)
            return logits, value, None
        return ac_apply
    if kind in ("dqn", "dueling_dqn"):
        from gymothelloenv_tpu.agents.dqn import featurize3
        from gymothelloenv_tpu.models import DQNNet, DuelingDQNNet
        net = (DuelingDQNNet if kind == "dueling_dqn"
               else DQNNet)(num_actions=cfg.num_actions)

        def q_apply(p, obs):
            board = (obs[:, 1] - obs[:, 0]).astype(jnp.int8)
            turn = (obs[:, 2, 0, 0] * 2 - 1).astype(jnp.int8)
            q = net.apply(p, featurize3(board, turn))
            return q * 1e6, jnp.zeros(obs.shape[0]), None
        return q_apply
    raise ValueError(f"unknown checkpoint kind: {kind}")
