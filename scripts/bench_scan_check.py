"""Validate the scan-of-chunks bench timing: wall time must scale linearly
with the number of chained chunks, and the episode count must match the
~60-ply mean game length.  Guards against non-blocking host fetches on the
axon tunnel producing fantasy throughput numbers."""

import time

import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.ops.pallas_rollout import (rollout_chunks_scanned,
                                                  rollout_init)
from gymothelloenv_tpu.utils.tpu import warmup

BATCH = 4096
CHUNK = 512


def measure(state, seed0, n_chunks):
    return rollout_chunks_scanned(state, seed0, n_chunks, CHUNK)


def main():
    warmup()
    state = rollout_init(BATCH)
    np.asarray(state.cur[0])
    for n in (16, 64, 256):
        state, total = measure(state, jnp.int32(1), n)   # compile + warm
        int(total)
        t0 = time.perf_counter()
        state, total = measure(state, jnp.int32(100), n)
        tot = int(total)
        dt = time.perf_counter() - t0
        plies = BATCH * CHUNK * n
        print(f"n={n:4d}: {dt*1e3:8.1f} ms  {plies/dt/1e6:8.1f} M plies/s  "
              f"episodes={tot}  plies/episode={plies/max(tot,1):.1f}",
              flush=True)


if __name__ == "__main__":
    main()
