"""Memory-bounded batched policy evaluation.

The deep scripted searches (maximin-2/3) and the net value-lookahead
operators materialize up to ``A^2 = 4096`` child boards (plus featurized
observations and trunk activations) per game per decision.  A plain
``vmap`` over the game batch multiplies that by the number of games, which
exceeds device memory above a few hundred games (RESULTS.md round-3
caveat: maximin-3 vmaps died above ~125 games; 400-game lookahead ×
maximin-3 crashed the TPU worker).  The reference never has this problem
because its depth-k search is a per-game Python recursion
(/root/reference/simple_policies.py:111-155) — slow but O(depth) memory.

This module restores arbitrary-game-count robustness the TPU-native way:
``chunked_batched`` lifts a per-game ``act(key, state)`` policy to a
batched ``act(keys, states)`` that pads the game batch to a multiple of
``chunk`` and runs ``lax.map`` over chunk-sized vmapped slabs, so live
memory is ``chunk × per-game expansion`` regardless of the batch size.
The tournament runner calls batched policies directly (see
``train.tournament._policy_call``); everything stays inside one jitted
program — no host-side game chunking needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Rough live-memory cost (in "board units" ~ one 8x8 child board plus its
# share of plane intermediates / activations) per game per decision, used
# to pick chunk sizes.  Calibrated against observed limits: maximin-3
# vmaps were safe at 125 games (125 x 4096 units) and lookahead-1 at 200
# games; we budget well under both.
COST_CHEAP = 1            # rand / greedy / plain net forward
COST_MAXIMIN_1 = 64       # one ply of children
COST_MAXIMIN_DEEP = 4096  # depth>=2: 64x64 live boards (deeper levels
#                           serialize through lax.map, same live set)
COST_LOOKAHEAD_1 = 2048   # 64 children + featurized obs + trunk acts
COST_LOOKAHEAD_2 = 65536  # 64x the above

# Live-unit budget per policy call.  262144 units => chunk 64 for
# maximin-2/3 (16x under the observed 125-game limit incl. the case where
# both sides of a pairing are deep searches).
LIVE_BUDGET = 1 << 18

# Empirical TPU findings (round-4 bisect, data/logs/queue/
# 19_diag_chunking.log, 20b_bisect_crash.log, 20f_headline_retry.log):
#   * maximin-2 and net-lookahead device-chunking runs clean and
#     bit-matches unchunked results (chunk 25/50 for maximin-2, 128 for
#     lookahead-1, 4 for lookahead-2) — but deep chunks of exactly 64
#     (the 64x64x64 games/roots/leaves shape) kernel-fault the worker,
#     so deep chunks are capped at DEEP_CHUNK_CAP.
#   * maximin-3 under an OUTER game lax.map (its root expansion is
#     itself an inner lax.map -> map-in-map inside the tournament
#     while_loop) crashes at n >= 200 games REGARDLESS of chunk size,
#     while the round-3 full-vmap shape is proven clean to ~125 games.
#     Depth>=3 searches are therefore never device-chunked; the CLIs run
#     them full-vmap in host-side segments of <= SAFE_DEEP3_GAMES games
#     (multiple dispatches of the proven program shape).
DEEP_CHUNK_CAP = 50
SAFE_DEEP3_GAMES = 100


def device_chunk_unsafe(spec: str) -> bool:
    """True for policies whose expansion cannot ride the outer game
    lax.map on TPU (maximin depth >= 3 — see the note above)."""
    if spec.startswith("maximin-"):
        return int(spec.split("-")[1]) >= 3
    return False


def host_segment_size(specs, num_games: int) -> int:
    """Games per host-side program segment: ``num_games`` (one program)
    unless a depth>=3 search is involved and the batch exceeds the safe
    full-vmap size."""
    if num_games > SAFE_DEEP3_GAMES and any(
            device_chunk_unsafe(s) for s in specs):
        return SAFE_DEEP3_GAMES
    return num_games


def live_cost_of_spec(spec: str, lookahead_depth: int = 0) -> int:
    """Per-game live cost of a policy spec string (tournament CLI specs:
    ``rand | greedy | maximin-<k> | ckpt paths``).  ``lookahead_depth``
    overrides for net checkpoints evaluated with ``--lookahead``."""
    if lookahead_depth >= 2:
        return COST_LOOKAHEAD_2
    if lookahead_depth == 1:
        return COST_LOOKAHEAD_1
    if spec.startswith("maximin-"):
        depth = int(spec.split("-")[1])
        if depth <= 1:
            return COST_MAXIMIN_1
        return COST_MAXIMIN_DEEP
    return COST_CHEAP


def auto_chunk(num_games: int, cost: int, budget: int = LIVE_BUDGET) -> int:
    """Largest chunk that keeps ``chunk * cost`` within ``budget`` (at
    least 1); 0 means "no chunking needed" (the full batch fits).  Deep
    scripted searches are additionally capped at ``DEEP_CHUNK_CAP`` (see
    the note above)."""
    if num_games * cost <= budget:
        return 0
    chunk = max(1, budget // cost)
    if cost >= COST_MAXIMIN_DEEP:
        chunk = min(chunk, DEEP_CHUNK_CAP)
    return chunk


def chunked_batched(act, chunk: int):
    """Lift a per-game ``act(key, state) -> action`` policy into a batched
    ``act(keys, states) -> actions`` evaluated ``chunk`` games at a time:
    the first ``n // chunk`` chunks run under ``lax.map`` (one compiled
    chunk-sized body, serialized), the remainder (``n % chunk`` games,
    strictly smaller) as one direct vmap call.  No padding — an earlier
    pad-to-multiple variant (concatenate head copies, drop the padded
    outputs) crashed the TPU worker on large maximin-3 programs where the
    pad-free shapes run clean (data/logs/queue/19*_*.log,
    20b_bisect_crash.log).  Live memory is bounded by
    ``chunk x per-game expansion`` either way.

    The returned function carries ``batched = True`` so the tournament
    runner calls it on the whole batch instead of vmapping it.
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")

    def batched_act(keys, states):
        n = keys.shape[0]
        m, r = divmod(n, chunk)
        parts = []
        if m > 0:
            keys_r = keys[:m * chunk].reshape(
                (m, chunk) + keys.shape[1:])
            states_r = jax.tree.map(
                lambda x: x[:m * chunk].reshape(
                    (m, chunk) + x.shape[1:]), states)
            out = jax.lax.map(lambda kc: jax.vmap(act)(kc[0], kc[1]),
                              (keys_r, states_r))
            parts.append(out.reshape(-1))
        if r > 0:
            tail = jax.tree.map(lambda x: x[m * chunk:], states)
            parts.append(jax.vmap(act)(keys[m * chunk:], tail))
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    batched_act.batched = True
    return batched_act


def maybe_chunked(act, num_games: int, cost: int,
                  chunk_override: int = 0, budget: int = LIVE_BUDGET,
                  label: str = ""):
    """Apply ``chunked_batched`` when the cost model says the full-batch
    vmap would exceed the live budget.  ``chunk_override``: >0 forces that
    chunk size, <0 disables chunking, 0 = auto.  ``label`` (optional)
    logs the decision so on-chip runs record their memory layout."""
    if chunk_override < 0:
        return act
    chunk = chunk_override or auto_chunk(num_games, cost, budget)
    if chunk_override > DEEP_CHUNK_CAP and cost >= COST_MAXIMIN_DEEP:
        # Even explicit overrides must not reach the faulting 64-game
        # deep-expansion shape (no user-reachable crash).
        print(f"[chunking] {label or 'deep search'}: forced chunk "
              f"{chunk_override} clamped to {DEEP_CHUNK_CAP} "
              f"(see DEEP_CHUNK_CAP note)", flush=True)
        chunk = DEEP_CHUNK_CAP
    if chunk == 0 or chunk >= num_games:
        return act
    if label:
        print(f"[chunking] {label}: {num_games} games in chunks of "
              f"{chunk} (cost {cost}/game)", flush=True)
    return chunked_batched(act, chunk)
