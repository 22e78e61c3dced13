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
        outs = [p.communicate(timeout=900)[0] for p in procs]
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
    from multihost_worker import (dqn_full_chunks, ppo_full_step,
                                  ts_full_chunks)

    from gymothelloenv_tpu.parallel import make_mesh

    expect = ppo_full_step(make_mesh(8))
    got = [float(re.search(r"ppo_value_loss=([0-9.eE+-]+)", out).group(1))
           for out in outs]
    assert got[0] == got[1], got
    assert abs(got[0] - expect) < 5e-3 * max(1.0, abs(expect)), \
        (got[0], expect)

    # DQN+PER and teacher-student full chunks (BASELINE configs[4]):
    # every process reports the same digests (replicated replay/params
    # are host-consistent), and they match the single-process run of the
    # identical global program on this test's own 8-device mesh.
    def field(out, name):
        return re.search(rf"{name}=([0-9.eE+-]+)", out).group(1)

    for name in ("dqn_params", "dqn_prio", "dqn_size", "dqn_t",
                 "ts_teacher", "ts_student"):
        assert field(outs[0], name) == field(outs[1], name), \
            (name, field(outs[0], name), field(outs[1], name))

    def close(a, b, rtol=5e-3):
        return abs(a - b) <= rtol * max(1.0, abs(b))

    dqn_p, dqn_prio, dqn_size, dqn_t = dqn_full_chunks(make_mesh(8))
    assert close(float(field(outs[0], "dqn_params")), float(dqn_p))
    assert close(float(field(outs[0], "dqn_prio")), float(dqn_prio))
    assert int(field(outs[0], "dqn_size")) == dqn_size > 0
    assert int(field(outs[0], "dqn_t")) == dqn_t > 0

    ts_t, ts_s = ts_full_chunks(make_mesh(8))
    assert close(float(field(outs[0], "ts_teacher")), float(ts_t))
    assert close(float(field(outs[0], "ts_student")), float(ts_s))

    # Per-shard replay across the cluster: the pod mesh is the same
    # (8, 1) global program as this test's single-process 8-device mesh,
    # so ring totals and params must agree (sampling streams included).
    from multihost_worker import dqn_pershard_chunks

    ps_p, ps_prio, ps_data, ps_size, ps_t = dqn_pershard_chunks(
        make_mesh(8))
    for name in ("ps_params", "ps_prio", "ps_data", "ps_size", "ps_t"):
        assert field(outs[0], name) == field(outs[1], name), name
    assert close(float(field(outs[0], "ps_params")), float(ps_p))
    assert close(float(field(outs[0], "ps_prio")), float(ps_prio))
    assert int(field(outs[0], "ps_data")) == ps_data
    assert int(field(outs[0], "ps_size")) == ps_size > 0
    assert int(field(outs[0], "ps_t")) == ps_t > 0
