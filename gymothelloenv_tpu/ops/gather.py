"""TPU-friendly batched row gather.

XLA lowers a row gather on a >2-D operand (e.g. ``obs[(K,), 4, 8, 8]``)
into a slow per-row path on TPU: measured on-chip, gathering 64K rows of a
(256K, 4, 8, 8) float32 array costs ~15 ms, while the identical bytes
gathered through a (256K, 256) 2-D view cost ~2.3 ms
(scripts/profile_update_breakdown.py).  ``gather_rows`` routes every row
gather through a 2-D view; reshapes are free (layout no-ops).
"""

from __future__ import annotations

import jax.numpy as jnp


def gather_rows(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``x[idx]`` along axis 0, lowered via a 2-D view when ``x`` has more
    than one trailing dim.  ``idx`` must be 1-D."""
    if x.ndim <= 2:
        return x[idx]
    flat2 = x.reshape(x.shape[0], -1)
    return flat2[idx].reshape((idx.shape[0],) + x.shape[1:])
