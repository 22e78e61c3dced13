"""Verify drive: rollout_chunk_sharded on the real chip (1-device mesh,
real Pallas kernel — not interpret).  Confirms the shard_map composition
lowers and executes on TPU hardware and the episode-count psum is sane."""

import time

import jax
import numpy as np

from gymothelloenv_tpu.utils import tpu
from gymothelloenv_tpu.ops import pallas_rollout as pr
from jax.sharding import Mesh


def main():
    tpu.warmup()
    devs = jax.devices()
    mesh = Mesh(np.array(devs).reshape(len(devs), 1), ("data", "model"))
    n, steps = 4096, 512
    state = pr.rollout_init(n)
    t0 = time.perf_counter()
    state, eps = pr.rollout_chunk_sharded(state, 7, steps, mesh,
                                          axis="data")
    eps = int(eps)
    dt = time.perf_counter() - t0
    expect = n * steps / 61
    print(f"devices={len(devs)} episodes={eps} (expect ~{expect:.0f}) "
          f"first-call {dt:.1f}s", flush=True)
    # steady-state rate
    t0 = time.perf_counter()
    state, eps2 = pr.rollout_chunk_sharded(state, 8, steps, mesh,
                                           axis="data")
    eps2 = int(eps2)
    dt = time.perf_counter() - t0
    print(f"episodes={eps2} steady {n * steps / dt / 1e6:.1f} M plies/s "
          f"(incl. dispatch+fetch)", flush=True)
    assert 0.8 * expect < eps < 1.2 * expect, eps
    assert 0.8 * expect < eps2 < 1.2 * expect, eps2
    print("OK", flush=True)


if __name__ == "__main__":
    main()
