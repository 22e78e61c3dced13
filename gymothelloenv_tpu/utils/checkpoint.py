"""Checkpointing — the rebuild of ``util.save``/``util.load``
(/root/reference/util.py:9-25): a step-indexed dict of
{step, params, opt_state, extra} serialized with flax msgpack.

Unlike the reference's pickled whole-model ``torch.save(actor_critic)``
(ppo_run_self_play.py:218-223), checkpoints here are pure pytrees —
architecture lives in code, so files are portable across refactors.
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def _host_copy(tree: Any) -> Any:
    """``jax.device_get`` that also works on a multi-process (pod)
    cluster: replicated leaves spanning non-addressable devices are read
    from the local replica (params/opt_state are replicated in every
    trainer's sharding layout, so the local shard is the full value)."""
    from gymothelloenv_tpu.utils.tpu import fetch_replicated
    return jax.tree.map(fetch_replicated, tree)


def save_checkpoint(path: str, step: int, params: Any, opt_state: Any = None,
                    extra: dict | None = None) -> None:
    payload = {
        "step": step,
        "params": _host_copy(params),
        "opt_state": _host_copy(opt_state),
        # Host-copy device arrays hiding in extra (e.g. simple-PPO's
        # vecnorm state) so saving is pod-safe; plain values pass through.
        "extra": jax.tree.map(
            lambda x: _host_copy(x) if isinstance(x, jax.Array) else x,
            extra or {}),
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(payload)))
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template: Any = None,
                    opt_state_template: Any = None):
    """Returns (step, params, opt_state, extra).  Templates restore the
    original pytree structure (msgpack stores plain dicts)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = payload["params"]
    opt_state = payload["opt_state"]
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    if opt_state_template is not None:
        opt_state = serialization.from_state_dict(opt_state_template,
                                                  opt_state)
    return int(payload["step"]), params, opt_state, payload.get("extra", {})
