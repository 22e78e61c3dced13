"""Validate the scan-of-chunks bench timing: wall time must scale linearly
with the number of chained chunks, and the episode count must match the
~60-ply mean game length.  Guards against non-blocking host fetches on the
axon tunnel producing fantasy throughput numbers."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.ops.pallas_rollout import rollout_chunk, rollout_init
from gymothelloenv_tpu.utils.tpu import warmup

BATCH = 4096
CHUNK = 512


@functools.partial(jax.jit, static_argnames=("n_chunks",))
def measure(state, seed0, n_chunks):
    def body(carry, seed):
        state, total = carry
        state, episodes = rollout_chunk(state, seed, CHUNK)
        return (state, total + episodes), None
    (state, total), _ = jax.lax.scan(
        body, (state, jnp.int32(0)),
        seed0 + jnp.arange(n_chunks, dtype=jnp.int32))
    return state, total


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
