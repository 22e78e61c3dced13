"""TPU-tunnel workarounds for the axon backend.

On this image the TPU is reached through a PJRT tunnel whose one-time
initialization rides the *first device->host transfer*.  If a large program
is enqueued before that first transfer, the handshake can wedge
indefinitely (observed repeatedly with scan-of-512-steps programs).  Every
entry point that may run on the tunnel calls :func:`warmup` first: one tiny
computation + host fetch absorbs the init stall (~3-4 min) before real work
is queued.  No-op (fast) on CPU and regular TPU backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def warmup() -> None:
    """Force backend init + one tiny device->host transfer."""
    x = jax.jit(lambda v: v + 1)(jnp.zeros((8,), jnp.int32))
    np.asarray(x)


def fetch_scalar(x) -> float:
    """``float(x)`` that also works on a multi-process (pod) cluster.

    Scalars coming out of a GSPMD train step on a pod mesh are globally
    REPLICATED ``jax.Array``s spanning non-addressable devices, so plain
    ``float()`` raises; the local replica carries the full value.  Keeps
    every trainer's host loop (metric logs, win-rate fetches) runnable
    unchanged under ``jax.distributed`` — the multihost coverage the
    reference's single-host mp.Pipe design never had (SURVEY.md §2.3)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return float(np.asarray(x.addressable_data(0)))
    return float(x)


def fetch_replicated(x) -> np.ndarray:
    """Host copy of a (replicated) array, pod-safe — see fetch_scalar."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        return np.asarray(x.addressable_data(0))
    return np.asarray(x)
