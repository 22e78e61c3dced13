"""Micro-benchmark: Pallas bitboard legal-mask kernel vs the fused-XLA
version, on whatever backend is active.

Usage:  python scripts/bench_pallas.py [batch]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import bitboard as bb
from gymothelloenv_tpu.ops.pallas_bitboard import legal_mask_pallas
from gymothelloenv_tpu.utils.tpu import warmup


def main():
    warmup()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rng = np.random.RandomState(0)
    cells = rng.randint(0, 3, (n, 8, 8))
    mine = bb.pack(jnp.asarray(cells == 1))
    opp = bb.pack(jnp.asarray(cells == 2))

    xla = jax.jit(bb.legal_mask)
    pallas = jax.jit(legal_mask_pallas)

    # parity first
    np.testing.assert_array_equal(np.asarray(pallas(mine, opp)),
                                  np.asarray(xla(mine, opp)))
    print(f"parity OK at batch {n}")

    for name, fn in (("xla", xla), ("pallas", pallas)):
        out = fn(mine, opp)
        _ = np.asarray(out[0])               # sync
        reps = 200
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(mine, opp)
        _ = np.asarray(out[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:7s}: {dt * 1e6:8.1f} us -> "
              f"{n / dt / 1e6:9.1f} M boards/s")


if __name__ == "__main__":
    main()
