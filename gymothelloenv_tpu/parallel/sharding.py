"""Mesh/sharding utilities — the TPU-native replacement for the reference's
parallel substrate (8 ``mp.Process`` env workers + a single-device learner,
envs.py:19-25): here the game batch is sharded over the ``data`` mesh axis,
parameters are replicated (or tensor-sharded over ``model``), and XLA/GSPMD
inserts the ICI collectives that the reference's pipe protocol approximated
in Python.
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def assert_tree_allclose(a, b, rtol=5e-3, atol=1e-5, name="tree",
                         require_finite=False):
    """1-vs-N-device parity gate comparator, shared by the
    ``dryrun_multichip`` driver entry and tests/test_sharded_trainers.py
    so the two gates can't drift: a sharded step is ONE GSPMD program and
    must reproduce the single-device math to float-reassociation
    tolerance."""
    flat_a, _ = jax.tree.flatten(a)
    flat_b, _ = jax.tree.flatten(b)
    assert len(flat_a) == len(flat_b), name
    for x, y in zip(flat_a, flat_b):
        x, y = np.asarray(x), np.asarray(y)
        if require_finite and not np.all(np.isfinite(y.astype(np.float64))):
            raise AssertionError(f"{name}: non-finite values in sharded run")
        np.testing.assert_allclose(x, y, rtol=rtol, atol=atol,
                                   err_msg=f"{name}: 1-vs-N divergence")


def make_mesh(n_devices: int | None = None,
              axis_names: Sequence[str] = ("data", "model"),
              model_parallel: int = 1) -> Mesh:
    """Mesh over the first ``n_devices`` devices, shaped
    (n//model_parallel, model_parallel)."""
    devices = jax.devices()[:n_devices] if n_devices else jax.devices()
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by "
                         f"model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


# Tensor-parallel partition rules for PolicyNet: the 512-wide fc + heads are
# the only layers with enough width to shard; conv trunk stays replicated.
_POLICY_TP_RULES = (
    (r"Dense_0/kernel$", P(None, "model")),   # fc 256->512
    (r"Dense_0/bias$", P("model")),
    (r"Dense_1/kernel$", P("model", None)),   # critic 512->1
    (r"Dense_2/kernel$", P("model", None)),   # categorical head 512->A
)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def policy_param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for PolicyNet params: tensor-parallel over
    'model' where a rule matches, replicated otherwise."""
    def assign(path, leaf):
        name = _path_str(path)
        for pattern, spec in _POLICY_TP_RULES:
            if re.search(pattern, name) and "model" in mesh.axis_names:
                if mesh.shape["model"] > 1:
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map_with_path(assign, params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: int = 0):
    """Shard the given array axis over 'data'."""
    def make(leaf_ndim: int):
        spec = [None] * leaf_ndim
        spec[axis] = "data"
        return P(*spec)
    return make


def _is_key_leaf(leaf) -> bool:
    try:
        return jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)
    except (TypeError, AttributeError):
        return False


def _batch_spec(leaf, axis: int, batch_size: int | None):
    """P(...) sharding ``axis`` over 'data' — but only for leaves that
    actually carry the batch dimension there (scalar carries like the scan
    PRNG key replicate).  Typed PRNG-key leaves are left unconstrained:
    with_sharding_constraint on key-dtype arrays breaks jit's repeat-call
    fast path ("Execution supplied N-2 buffers...") — GSPMD propagates
    their layout from the surrounding ops instead."""
    if _is_key_leaf(leaf):
        return None
    if leaf.ndim <= axis:
        return P()
    if batch_size is not None and leaf.shape[axis] != batch_size:
        return P()
    spec = [None] * leaf.ndim
    spec[axis] = "data"
    return P(*spec)


def shard_batch_tree(mesh: Mesh, tree, axis: int = 0,
                     batch_size: int | None = None):
    """NamedSharding pytree sharding every batch-carrying leaf's ``axis``
    over 'data' (key leaves replicate)."""
    def assign(leaf):
        spec = _batch_spec(leaf, axis, batch_size)
        return NamedSharding(mesh, spec if spec is not None else P())
    return jax.tree.map(assign, tree)


def constrain_batch(tree, mesh: Mesh, axis: int = 0,
                    batch_size: int | None = None):
    """with_sharding_constraint variant of :func:`shard_batch_tree`
    (key leaves pass through unconstrained)."""
    def constrain(leaf):
        spec = _batch_spec(leaf, axis, batch_size)
        if spec is None:
            return leaf
        return jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, spec))
    return jax.tree.map(constrain, tree)


def _batch_axes_spec(leaf, sizes: Sequence[int]):
    """P(...) sharding the first axis whose extent matches one of
    ``sizes`` (tried in order, so put the primary batch size first — a
    (2, N, ...) pending-pair leaf must shard axis 1, not the structural
    axis 0 even when ``2*N`` is also listed).  Only axes 0 and 1 are
    candidates: every batch tree this serves (env leaves (N, ...),
    pending pairs (2, N, ...), FIFO streams (k, 2N, ...)) carries its
    batch there, and deeper axes are feature/board dims whose extents
    can collide with a small ``N`` (e.g. N == board_size == 8 would
    otherwise shard a board-row axis).  Key leaves and leaves with no
    matching axis replicate (None → pass through unconstrained)."""
    if _is_key_leaf(leaf):
        return None
    for size in sizes:
        for ax, extent in enumerate(leaf.shape[:2]):
            if extent == size:
                spec = [None] * leaf.ndim
                spec[ax] = "data"
                return P(*spec)
    return P()


def shard_batch_axes(mesh: Mesh, tree, sizes: Sequence[int]):
    """NamedSharding pytree for heterogeneous batch trees (e.g. the DQN
    roll state: env leaves (N, ...), pending pairs (2, N, ...), n-step
    FIFO streams (k, 2N, ...)): shard the first axis matching a size in
    ``sizes`` over 'data'; everything else replicates."""
    def assign(leaf):
        spec = _batch_axes_spec(leaf, sizes)
        return NamedSharding(mesh, spec if spec is not None else P())
    return jax.tree.map(assign, tree)


def constrain_batch_axes(tree, mesh: Mesh, sizes: Sequence[int]):
    """with_sharding_constraint variant of :func:`shard_batch_axes`
    (key leaves pass through unconstrained)."""
    def constrain(leaf):
        spec = _batch_axes_spec(leaf, sizes)
        if spec is None:
            return leaf
        return jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, spec))
    return jax.tree.map(constrain, tree)


def constrain_replicated(tree, mesh: Mesh):
    """Constrain every (non-key) leaf fully replicated."""
    def constrain(leaf):
        if _is_key_leaf(leaf):
            return leaf
        return jax.lax.with_sharding_constraint(
            leaf, NamedSharding(mesh, P()))
    return jax.tree.map(constrain, tree)


def place_replicated(tree, mesh: Mesh):
    """device_put every leaf fully replicated on the mesh."""
    return jax.device_put(
        tree, jax.tree.map(lambda _: NamedSharding(mesh, P()), tree))
