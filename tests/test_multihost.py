"""Real 2-process jax.distributed run on CPU (gloo over localhost) — the
multi-host mechanics the reference never had (SURVEY.md §2.3: its only
"distributed" layer is mp.Pipe).  Spawns two worker processes, each a
"host" with 4 virtual devices, and checks cluster handshake, global batch
assembly from host-local shards, the cross-process gradient reduction,
and a FULL sharded PPO self-play train step whose value_loss must match
the same step run single-process on this test's own 8-device mesh
(tests/multihost_worker.py)."""

import os
import re
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_cluster():
    port = str(_free_port())
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("JAX_PLATFORMS", None)   # workers set their own backend
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in (0, 1)]
    try:
        outs = [p.communicate(timeout=420)[0] for p in procs]
    finally:
        for p in procs:       # don't orphan cluster members on timeout
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"OK proc{pid}" in out, out

    # The 2-process cluster's full PPO step must reproduce the same
    # global program run single-process on this test's 8-device mesh.
    from multihost_worker import ppo_full_step

    from gymothelloenv_tpu.parallel import make_mesh

    expect = ppo_full_step(make_mesh(8))
    got = [float(re.search(r"ppo_value_loss=([0-9.eE+-]+)", out).group(1))
           for out in outs]
    assert got[0] == got[1], got
    assert abs(got[0] - expect) < 5e-3 * max(1.0, abs(expect)), \
        (got[0], expect)
