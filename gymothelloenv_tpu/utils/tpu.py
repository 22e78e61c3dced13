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
