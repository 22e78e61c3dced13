"""Headline benchmark: batched 8x8 Othello env stepping throughput.

Prints ONE JSON line:
    {"metric": "env_steps_per_sec_chip", "value": N, "unit": "steps/s",
     "vs_baseline": N / 1e7}

Protocol (BASELINE.json configs[1]): 8x8 board, batch 4096, random legal
actions, auto-reset, everything inside one jitted ``lax.scan`` so the chip
never waits on the host.  Baseline target: 10M env-steps/s per v5e chip.

Fast path measured: the fused whole-rollout Pallas kernel
(ops/pallas_rollout.py) — packed uint32 game state lives in VMEM/registers,
CHUNK plies per kernel, MEASURE_CHUNKS kernels chained inside ONE jitted
scan (a single dispatch + host fetch for the whole measured region; through
the axon tunnel each Python-level kernel dispatch costs ~3-4 ms and a host
fetch ~20 ms, which used to dominate).  Fallback: the bitboard-native
vector env (envs/bit_vector_env.py) under the same scan harness.

Reliability: the axon TPU tunnel's first-transfer handshake wedges roughly
half the time (see CLAUDE.md); the parent process therefore supervises the
actual benchmark in a child with a timeout and retries with a cooldown, so
one wedged handshake doesn't lose the measurement.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

BATCH = 4096
CHUNK = 512           # env-steps per kernel invocation
MEASURE_CHUNKS = 512  # one jitted scan over chunks = one dispatch + fetch;
#   ~0.3 s measured region so the ~25 ms tunnel dispatch+fetch latency
#   inflates the number by <10% (scripts/bench_scan_check.py validates
#   linear scaling and episode counts)

CHILD_TIMEOUT_S = 480
MAX_ATTEMPTS = 4
RETRY_COOLDOWN_S = 90


def _child_main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gymothelloenv_tpu.core import bitboard as bb
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.envs.bit_vector_env import (bitvec_reset,
                                                       bitvec_step)

    @functools.partial(jax.jit, static_argnames=("cfg", "num_steps"))
    def rollout_chunk(state, key, cfg: EnvConfig, num_steps: int):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            actions = bb.random_legal_bit(k, state.core.legal)
            res = bitvec_step(state, actions, cfg)
            return (res.state, key), res.done.sum()

        (state, key), dones = jax.lax.scan(body, (state, key), None,
                                           length=num_steps)
        return state, key, dones.sum()

    # Both paths time ONE dispatch + ONE host fetch for the whole measured
    # region: through the axon tunnel a Python dispatch costs ~25 ms and a
    # host fetch ~19 ms, which at ~5 ms of device work per 512-ply chunk
    # would dominate the measurement (they did: 88M "steps/s" before this
    # was restructured vs ~400M of actual kernel throughput).

    def run_scan_path():
        cfg = EnvConfig()
        key = jax.random.PRNGKey(0)
        key, k0 = jax.random.split(key)
        state0 = bitvec_reset(k0, BATCH)
        # Synchronize via host fetches, not block_until_ready (a no-op on
        # the axon backend); the tiny fetch absorbs the tunnel init BEFORE
        # any large program is queued.
        np.asarray(state0.core.black[0])

        @functools.partial(jax.jit, static_argnames=("n_chunks",))
        def measure(state, key, n_chunks):
            def body(carry, k):
                state, total = carry
                state, _, episodes = rollout_chunk(state, k, cfg, CHUNK)
                return (state, total + episodes), None
            (state, total), _ = jax.lax.scan(
                body, (state, jnp.int32(0)),
                jax.random.split(key, n_chunks))
            return state, total

        # Warm up the EXACT measured program (n_chunks is a static arg — a
        # different chunk count would compile inside the timed region).
        key, kw, km = jax.random.split(key, 3)
        state, total = measure(state0, kw, MEASURE_CHUNKS)
        int(total)
        t0 = time.perf_counter()
        state, total = measure(state, km, MEASURE_CHUNKS)
        assert int(total) > 0
        return time.perf_counter() - t0

    def run_pallas_path():
        # Canonical single-dispatch harness lives next to the kernel
        # (ops/pallas_rollout.rollout_chunks_scanned).
        from gymothelloenv_tpu.ops.pallas_rollout import (
            rollout_chunks_scanned, rollout_init)

        state = rollout_init(BATCH)
        np.asarray(state.cur[0])   # absorb the tunnel init
        # Warm up the EXACT measured program (see run_scan_path).
        state, total = rollout_chunks_scanned(state, 1, MEASURE_CHUNKS,
                                              CHUNK)
        int(total)
        t0 = time.perf_counter()
        state, total = rollout_chunks_scanned(state, 1000, MEASURE_CHUNKS,
                                              CHUNK)
        assert int(total) > 0
        return time.perf_counter() - t0

    try:
        # Fused whole-rollout pallas kernel (ops/pallas_rollout.py): the
        # entire CHUNK of plies in one kernel, no per-step dispatch.
        dt = run_pallas_path()
    except Exception as e:  # noqa: BLE001 — any compile/runtime failure
        print(f"# pallas rollout path failed ({type(e).__name__}: {e}); "
              "falling back to the scan path", file=sys.stderr, flush=True)
        dt = run_scan_path()

    steps_per_sec = BATCH * CHUNK * MEASURE_CHUNKS / dt
    print(json.dumps({
        "metric": "env_steps_per_sec_chip",
        "value": round(steps_per_sec),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / 1e7, 4),
    }), flush=True)


def main():
    if os.environ.get("_GYMOTHELLO_BENCH_CHILD") == "1":
        _child_main()
        return
    env = dict(os.environ)
    env["_GYMOTHELLO_BENCH_CHILD"] = "1"
    repo = os.path.dirname(os.path.abspath(__file__))
    if repo not in env.get("PYTHONPATH", ""):
        env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    for attempt in range(MAX_ATTEMPTS):
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, timeout=CHILD_TIMEOUT_S,
                capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            print(f"# attempt {attempt + 1} wedged (tunnel handshake); "
                  f"retrying after {RETRY_COOLDOWN_S}s", file=sys.stderr,
                  flush=True)
            time.sleep(RETRY_COOLDOWN_S)
            continue
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line, flush=True)
                return
        print(f"# attempt {attempt + 1} produced no result "
              f"(rc={out.returncode}); stderr tail: "
              f"{out.stderr[-500:]}", file=sys.stderr, flush=True)
        time.sleep(RETRY_COOLDOWN_S)
    raise SystemExit("benchmark failed after retries")


if __name__ == "__main__":
    main()
