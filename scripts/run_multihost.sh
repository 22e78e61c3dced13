#!/bin/bash
# Multi-host launch recipe — one invocation per host of a pod slice.
#
# On Cloud TPU pods, each host just runs the SAME command:
#
#   bash scripts/run_multihost.sh python -m gymothelloenv_tpu.cli.ppo_self_play \
#       --num-envs 8192 --num-updates 4000 ...
#
# The injected sitecustomize detects the pod environment (the TPU
# runtime exports TPU_WORKER_HOSTNAMES on multi-host slices; export
# GYMO_POD=1 to force it) and calls the no-argument
# jax.distributed.initialize(), which auto-discovers the coordinator
# from the metadata environment.  Without that call each host would
# silently train its own independent copy.
#
# Elsewhere (e.g. CPU clusters, manual bring-up), export the cluster
# coordinates first on every host:
#
#   export GYMO_COORD=host0:12345        # coordinator address (host 0)
#   export GYMO_NPROCS=4                 # number of hosts
#   export GYMO_PROC_ID=<this host's 0-based index>
#
# The wrapper injects a sitecustomize that calls
# gymothelloenv_tpu.parallel.multihost.initialize() before user code, so
# any trainer CLI (ppo_self_play, dqn_train, teacher_vs_student, ...)
# becomes pod-ready unchanged: build the mesh with
# multihost.make_pod_mesh() (or pass mesh=... to the trainers) and the
# 'data' axis spans hosts — gradient all-reduces ride ICI within a host
# and DCN across hosts.
#
# A runnable 2-process localhost demo of the full sharded PPO train step
# is tests/test_multihost.py (CPU, gloo): the cluster's value_loss must
# match the single-process run bit-for-tolerance.

set -euo pipefail

BOOT=$(mktemp -d)
cat > "$BOOT/sitecustomize.py" <<'PY'
import os
import sys

# Python imports only the FIRST sitecustomize on sys.path; this shim
# shadows any platform one (e.g. a TPU-runtime bootstrap earlier on
# PYTHONPATH), so chain-load it before doing our own init.
_self_dir = os.path.dirname(os.path.abspath(__file__))
for _p in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    if not _p or os.path.abspath(_p) == _self_dir:
        continue
    _cand = os.path.join(_p, "sitecustomize.py")
    if os.path.exists(_cand):
        import runpy
        runpy.run_path(_cand)
        break

coord = os.environ.get("GYMO_COORD")
if coord:
    from gymothelloenv_tpu.parallel import multihost
    multihost.initialize(coord,
                         int(os.environ["GYMO_NPROCS"]),
                         int(os.environ["GYMO_PROC_ID"]))
elif (os.environ.get("GYMO_POD")
      or os.environ.get("TPU_WORKER_HOSTNAMES")):
    # Cloud TPU pod slice: the no-arg initialize auto-discovers the
    # coordinator from the metadata environment.  multihost.initialize's
    # no-arg form is deliberately a single-process no-op, so the pod
    # path must call jax.distributed directly.  Fail LOUDLY if discovery
    # fails — otherwise each host would silently train its own
    # independent copy (exceptions raised here are swallowed into a
    # one-line sitecustomize warning, so exit explicitly).
    import jax
    try:
        jax.distributed.initialize()
    except Exception as e:
        sys.stderr.write(
            f"run_multihost: pod jax.distributed.initialize() failed "
            f"({e!r}); set GYMO_COORD/GYMO_NPROCS/GYMO_PROC_ID "
            f"explicitly or unset GYMO_POD.\n")
        raise SystemExit(1)
PY

REPO=$(cd "$(dirname "$0")/.." && pwd)
PYTHONPATH="$BOOT:$REPO${PYTHONPATH:+:$PYTHONPATH}" exec "$@"
