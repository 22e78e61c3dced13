"""Real 2-process jax.distributed run on CPU (gloo over localhost) — the
multi-host mechanics the reference never had (SURVEY.md §2.3: its only
"distributed" layer is mp.Pipe).  A module-scoped fixture spawns two
worker processes ONCE — each a "host" with 4 virtual devices — and the
workers run EVERY trainer family across the cluster (matching the
reference's uniform process-pool coverage of PPO / teacher-student /
Rainbow workers, envs.py:19-25,260-288, plus the families it can't run).
Each family then has its own test: cross-process digest equality and
parity against the identical global program run single-process on this
test's own 8-device mesh (tests/multihost_worker.py).

ACKTR and GAIL share A2C's PPOSelfPlayTrainer mesh wiring (the subclasses
only swap `_do_update`); A2C is their cross-host representative — their
1-vs-8 single-process gates live in tests/test_sharded_trainers.py.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


# A single family (compile + 2 updates) takes ~1-4 min on the CPU mesh;
# 8 min without a new STAGE marker means that family is hung — fail
# then, naming it, instead of burning the whole 30-min cap first
# (round-5 VERDICT item 9).
STAGE_TIMEOUT = 480
TOTAL_TIMEOUT = 1800


@pytest.fixture(scope="module")
def cluster_outs(tmp_path_factory):
    """Boot the 2-process cluster once; workers run all families,
    emitting a flushed "STAGE <family> done" marker after each.  The
    fixture polls both stdout files and fails fast — pointing at the
    family that hung — when neither file grows for STAGE_TIMEOUT.
    Returns both processes' stdout."""
    import time

    port = str(_free_port())
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("JAX_PLATFORMS", None)   # workers set their own backend
    tmp = tmp_path_factory.mktemp("multihost")
    paths = [tmp / f"proc{pid}.out" for pid in (0, 1)]
    files = [open(p, "w") for p in paths]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), port],
        env=env, stdout=f, stderr=subprocess.STDOUT, text=True)
        for pid, f in zip((0, 1), files)]

    def read_outs():
        return [p.read_text() for p in paths]

    try:
        t0 = last_progress = time.time()
        sizes = [0, 0]
        while any(p.poll() is None for p in procs):
            time.sleep(5)
            for i, p in enumerate(paths):
                size = os.path.getsize(p)
                if size != sizes[i]:
                    sizes[i] = size
                    last_progress = time.time()
            now = time.time()
            if (now - last_progress > STAGE_TIMEOUT
                    or now - t0 > TOTAL_TIMEOUT):
                outs = read_outs()
                stages = [re.findall(r"STAGE (\S+) done", o)
                          for o in outs]
                raise AssertionError(
                    f"multihost cluster stalled "
                    f"({now - last_progress:.0f}s without output; "
                    f"completed stages proc0={stages[0]} "
                    f"proc1={stages[1]})\n"
                    f"--- proc0 tail ---\n{outs[0][-2000:]}\n"
                    f"--- proc1 tail ---\n{outs[1][-2000:]}")
    finally:
        for p in procs:       # don't orphan cluster members on failure
            if p.poll() is None:
                p.kill()
                p.wait()
        for f in files:
            f.close()
    outs = read_outs()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out}"
        assert f"OK proc{pid}" in out, out
    return outs


def _field(out, name):
    return re.search(rf"{name}=([0-9.eE+-]+)", out).group(1)


def _assert_cross_process_equal(outs, names):
    for name in names:
        assert _field(outs[0], name) == _field(outs[1], name), \
            (name, _field(outs[0], name), _field(outs[1], name))


def _close(a, b, rtol=5e-3):
    return abs(a - b) <= rtol * max(1.0, abs(b))


def _mesh8():
    from gymothelloenv_tpu.parallel import make_mesh
    return make_mesh(8)


def test_multihost_ppo(cluster_outs):
    # The 2-process cluster's full PPO step must reproduce the same
    # global program run single-process on this test's 8-device mesh.
    from multihost_worker import ppo_full_step

    expect = ppo_full_step(_mesh8())
    got = [float(_field(out, "ppo_value_loss")) for out in cluster_outs]
    assert got[0] == got[1], got
    assert abs(got[0] - expect) < 5e-3 * max(1.0, abs(expect)), \
        (got[0], expect)


def test_multihost_dqn_per(cluster_outs):
    from multihost_worker import dqn_full_chunks

    _assert_cross_process_equal(
        cluster_outs, ("dqn_params", "dqn_prio", "dqn_size", "dqn_t"))
    dqn_p, dqn_prio, dqn_size, dqn_t = dqn_full_chunks(_mesh8())
    out = cluster_outs[0]
    assert _close(float(_field(out, "dqn_params")), float(dqn_p))
    assert _close(float(_field(out, "dqn_prio")), float(dqn_prio))
    assert int(_field(out, "dqn_size")) == dqn_size > 0
    assert int(_field(out, "dqn_t")) == dqn_t > 0


def test_multihost_teacher_student(cluster_outs):
    from multihost_worker import ts_full_chunks

    _assert_cross_process_equal(cluster_outs, ("ts_teacher", "ts_student"))
    ts_t, ts_s = ts_full_chunks(_mesh8())
    out = cluster_outs[0]
    assert _close(float(_field(out, "ts_teacher")), float(ts_t))
    assert _close(float(_field(out, "ts_student")), float(ts_s))


def test_multihost_dqn_pershard(cluster_outs):
    # Per-shard replay across the cluster: the pod mesh is the same
    # (8, 1) global program as this test's single-process 8-device mesh,
    # so ring totals and params must agree (sampling streams included).
    from multihost_worker import dqn_pershard_chunks

    _assert_cross_process_equal(
        cluster_outs,
        ("ps_params", "ps_prio", "ps_data", "ps_size", "ps_t"))
    ps_p, ps_prio, ps_data, ps_size, ps_t = dqn_pershard_chunks(_mesh8())
    out = cluster_outs[0]
    assert _close(float(_field(out, "ps_params")), float(ps_p))
    assert _close(float(_field(out, "ps_prio")), float(ps_prio))
    assert int(_field(out, "ps_data")) == ps_data
    assert int(_field(out, "ps_size")) == ps_size > 0
    assert int(_field(out, "ps_t")) == ps_t > 0


def test_multihost_rainbow(cluster_outs):
    from multihost_worker import rainbow_full_chunks

    _assert_cross_process_equal(cluster_outs, ("rb_params", "rb_t"))
    rb_p, rb_t = rainbow_full_chunks(_mesh8())
    out = cluster_outs[0]
    assert _close(float(_field(out, "rb_params")), float(rb_p))
    assert int(_field(out, "rb_t")) == rb_t > 0


def test_multihost_rainbow_pershard(cluster_outs):
    from multihost_worker import rainbow_pershard_chunks

    _assert_cross_process_equal(
        cluster_outs,
        ("rbps_params", "rbps_data", "rbps_size", "rbps_t"))
    p, data, size, t = rainbow_pershard_chunks(_mesh8())
    out = cluster_outs[0]
    assert _close(float(_field(out, "rbps_params")), float(p))
    assert int(_field(out, "rbps_data")) == data
    assert int(_field(out, "rbps_size")) == size > 0
    assert int(_field(out, "rbps_t")) == t > 0


def test_multihost_a2c(cluster_outs):
    from multihost_worker import a2c_full_steps

    _assert_cross_process_equal(cluster_outs, ("a2c_params",))
    a2c_p = a2c_full_steps(_mesh8())
    assert _close(float(_field(cluster_outs[0], "a2c_params")),
                  float(a2c_p))


def test_multihost_ppo_recurrent(cluster_outs):
    from multihost_worker import ppo_recurrent_steps

    _assert_cross_process_equal(cluster_outs, ("rec_params",))
    rec_p = ppo_recurrent_steps(_mesh8())
    assert _close(float(_field(cluster_outs[0], "rec_params")),
                  float(rec_p))
