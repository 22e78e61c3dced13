"""Minimal repro for the TPU map-in-map kernel fault (round-4 bisect,
data/logs/queue/19_diag_chunking.log, 20b_bisect_crash.log; VERDICT r4
item 1a).

The faulting shape: a depth-3 maximin policy — whose ROOT expansion is an
inner ``lax.map`` over the 64 candidate moves — game-chunked by an OUTER
``lax.map`` (policies.chunking.chunked_batched) inside the tournament
``while_loop``.  At n >= 200 games this kills the TPU worker at the first
fetch (kernel fault), REGARDLESS of chunk size, while the same total
work runs clean as (a) one full vmap at n <= ~125 games or (b) the
round-5 restructured single-map node layout (chunking.maximin_deep_batched)
at any n.

Run on the real chip (wrap in `timeout`):
    python scripts/repro_map_in_map.py <n> nested [chunk]  # round-4 shape
    python scripts/repro_map_in_map.py <n> flat   [chunk]  # restructure

ROUND-5 FINDINGS (logs 46/48/49/49b, 2026-08-21 bisect matrix):

    flat  200 c50  (m=256)  CLEAN      nested 200 c50  CLEAN x2
    flat  250 c125 (m=128)  CLEAN      nested 400 c50  CRASH
    flat  400 c100 (m=256)  CRASH
    flat  500 c50/c125      CRASH      flat 1000 c50/c100  CRASH x3

The fault boundary tracks TOTAL per-call expansion size (~games x 64
roots x 4096 leaves), NOT program structure: m=256 slabs is clean at
n=200 and crashes at n=400; chunk 125 is clean at n=250 and crashes at
n=500; the nested map-in-map itself ran clean at n=200 (round 4's
"crashes at n>=200" was the flaky edge of the same size boundary).
Crashes surface ~1-3 min into execution.  Consequence in
policies/chunking.py: the restructured depth-3 path is used up to
DEEP3_MAX_GAMES=200 games/program (2x the round-4 segment) and
host-segmented above; nothing about the caps is structural — a future
jax/libtpu build should re-run this matrix.
"""

import sys

import jax

from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.policies.chunking import (chunked_batched,
                                                 maximin_deep_batched)
from gymothelloenv_tpu.policies.scripted import maximin_policy, random_policy
from gymothelloenv_tpu.train.tournament import play_games_impl
from gymothelloenv_tpu.utils.tpu import warmup

n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
mode = sys.argv[2] if len(sys.argv) > 2 else "nested"
chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 50
cfg = EnvConfig()

# Diagnostic escape hatch: the public APIs clamp deep chunks at
# DEEP_CHUNK_CAP (no user-reachable faulting shape); the probe needs to
# reach the shapes users can't.
from gymothelloenv_tpu.policies import chunking as _chunking  # noqa: E402
_chunking.DEEP_CHUNK_CAP = max(_chunking.DEEP_CHUNK_CAP, chunk)

warmup()
if mode == "nested":
    # lax.map(games) -> vmap -> lax.map(64 root moves) -> vmap(64x64):
    # the round-4 faulting structure.
    mm3 = chunked_batched(maximin_policy(3, cfg), chunk)
else:
    # One lax.map over (games x roots) node slabs: the restructure.
    mm3 = maximin_deep_batched(cfg, n, chunk_override=chunk)

winners = jax.jit(lambda k: play_games_impl(
    k, cfg, mm3, random_policy, n, 4))(jax.random.PRNGKey(0))
import numpy as np

print("winners histogram:",
      {int(v): int(c) for v, c in zip(*np.unique(np.asarray(winners),
                                                 return_counts=True))})
print(f"OK: mode={mode} n={n} completed without faulting")
