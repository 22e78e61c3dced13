"""Subprocess worker for tests/test_multihost.py — not a test module.

Each invocation is one "host" of a 2-process jax.distributed cluster
(gloo over localhost, 4 virtual CPU devices per process = 8 global).
Exercises the real multihost path (parallel/multihost.py): cluster
handshake, global pod mesh, host-local -> global batch assembly, and a
jitted loss gradient over the globally-sharded batch where GSPMD inserts
the cross-process reduction (the DCN gradient all-reduce of the DP
learner).
"""

import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import numpy as np                                     # noqa: E402
import jax                                             # noqa: E402
import jax.numpy as jnp                                # noqa: E402
from jax.sharding import PartitionSpec as P            # noqa: E402

from gymothelloenv_tpu.parallel import multihost       # noqa: E402


def main():
    multihost.initialize(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2, jax.process_count()
    mesh = multihost.make_pod_mesh()
    assert mesh.devices.size == 8, mesh

    GLOBAL = 16
    per, off = multihost.host_batch_slice(GLOBAL)
    assert per == 8 and off == pid * 8

    x_local = np.arange(off, off + per, dtype=np.float32)
    x = multihost.assemble_global(mesh, P("data"), x_local)

    # Global reduction over the sharded batch.
    total = jax.jit(jnp.sum)(x)
    got = float(np.asarray(total.addressable_data(0)))
    assert got == sum(range(GLOBAL)), got

    # DP gradient: d/dw mean((x*w)^2) over the GLOBAL batch = 2*mean(x^2)
    # at w=1 — GSPMD inserts the cross-process (DCN-role) reduction.
    w = jnp.ones((1,))

    def loss(w, x):
        return jnp.mean((x * w[0]) ** 2)

    g = jax.jit(jax.grad(loss))(w, x)
    g_val = float(np.asarray(g.addressable_data(0))[0])
    expect = float(2.0 * np.mean(np.arange(GLOBAL, dtype=np.float64) ** 2))
    assert abs(g_val - expect) < 1e-3, (g_val, expect)
    print(f"OK proc{pid} sum={got} grad={g_val}", flush=True)


if __name__ == "__main__":
    main()
