"""Multi-host support over DCN — replaces nothing in the reference (it has
no multi-node path, SURVEY.md §2.3) and provides the pod-slice scale-out the
BASELINE targets: env batches sharded across hosts, data-parallel learner
with XLA collectives over ICI within hosts and DCN across them.

Usage on each host of a pod slice:

    from gymothelloenv_tpu.parallel import multihost
    multihost.initialize()                   # jax.distributed handshake
    mesh = multihost.make_pod_mesh(model_parallel=1)
    # then exactly the same make_sharded_train_step(...) as single-host:
    # global batch arrays are created with jax.make_array_from_callback
    # or by sharding host-local batches (host_local_array_to_global_array).

This module is exercised in CI only via its single-process degenerate path
(one process == one "host"); real multi-host runs need a pod slice.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from gymothelloenv_tpu.parallel.sharding import make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """``jax.distributed.initialize`` with TPU auto-detection: on Cloud TPU
    pods all arguments are discovered from the metadata environment; pass
    them explicitly elsewhere.  Safe no-op for a single process with no
    coordinator configured."""
    if coordinator_address is None and num_processes in (None, 1):
        # Single-process (possibly multi-chip) — nothing to initialize.
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_pod_mesh(model_parallel: int = 1) -> Mesh:
    """Mesh over every device in the pod slice (jax.devices() is global
    after ``initialize``).  The ``data`` axis spans hosts — game batches
    shard across hosts, gradient all-reduces ride ICI within a host and
    DCN across hosts (XLA picks the hierarchical reduction)."""
    return make_mesh(n_devices=None, model_parallel=model_parallel)


def host_batch_slice(global_batch: int) -> tuple[int, int]:
    """(host-local batch size, offset) for building host-local env batches
    that assemble into a globally-sharded array."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return per, i * per


def assemble_global(mesh: Mesh, spec, host_local: np.ndarray):
    """Lift per-host arrays into one global sharded jax.Array."""
    from jax.experimental import multihost_utils
    return multihost_utils.host_local_array_to_global_array(
        host_local, mesh, spec)
