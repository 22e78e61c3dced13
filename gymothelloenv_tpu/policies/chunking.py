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
batched ``act(keys, states)`` that runs ``lax.map`` over chunk-sized
vmapped slabs (pad-free: head slabs + a remainder vmap), so live memory
is ``chunk × per-game expansion`` regardless of the batch size.
The tournament runner calls batched policies directly (see
``train.tournament._policy_call``).  Programs whose TOTAL expansion
would cross the chip's crash boundary (see TOTAL_EXPANSION_CAP below)
are additionally split into host-side segments by the CLIs via
``host_segment_size`` — still one user invocation.
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

# Fallback live-unit budget per policy call when device memory can't be
# queried (CPU meshes, tests).  262144 units => chunk 64 for maximin-2/3
# (16x under the observed 125-game limit incl. the case where both sides
# of a pairing are deep searches).
DEFAULT_LIVE_BUDGET = 1 << 18
# Back-compat alias (scripts/tests import this name).
LIVE_BUDGET = DEFAULT_LIVE_BUDGET

# Unit calibration for the device-derived budget (round-5 VERDICT item
# 1b): one "unit" is ~one 8x8 child board plus its share of plane
# intermediates and trunk activations — physically ~8-16 KB live at
# peak.  UNIT_BYTES = 64 KiB prices a unit at 4-8x its physical
# footprint, so a chip-derived budget of bytes_limit // UNIT_BYTES keeps
# the same safety margin the hand-calibrated 1<<18 had on the 16 GiB
# chip it was bisected on (17.18e9 / 65536 = 262144 — the derivation
# reproduces the proven constant there and scales with HBM elsewhere).
UNIT_BYTES = 1 << 16
# Never trust the derivation outside the envelope the crash bisect
# explored: floor at a quarter of the proven budget (tiny devices still
# get working, smaller chunks) and cap at 16x (a 256 GiB device has no
# crash data behind it; DEEP_CHUNK_CAP below still binds regardless).
BUDGET_FLOOR = DEFAULT_LIVE_BUDGET // 4
BUDGET_CAP = DEFAULT_LIVE_BUDGET * 16

_budget_cache: list = []


def live_budget() -> int:
    """Per-policy-call live-unit budget, derived from the local device's
    HBM size (``memory_stats()['bytes_limit']``) when available, else
    ``DEFAULT_LIVE_BUDGET``.  Cached after first query (device topology
    doesn't change mid-process).

    Probed 2026-08-21 (data/logs/queue/43_mem_probe.log): the axon
    tunnel's TPU v5 lite reports ``memory_stats() = None``, so THIS
    chip runs on the fallback — which equals the derivation for its
    16 GiB HBM (17.18e9 // 65536 = 262144), i.e. fallback and formula
    agree on the hardware the crash bisect calibrated.  Backends that do
    report stats get the scaled budget."""
    if not _budget_cache:
        budget = DEFAULT_LIVE_BUDGET
        try:
            import jax as _jax
            stats = _jax.local_devices()[0].memory_stats() or {}
            limit = int(stats.get("bytes_limit", 0))
            if limit > 0:
                budget = max(BUDGET_FLOOR,
                             min(BUDGET_CAP, limit // UNIT_BYTES))
        except Exception:
            pass
        _budget_cache.append(budget)
    return _budget_cache[0]

# Empirical TPU findings (round-4 bisect, data/logs/queue/
# 19_diag_chunking.log, 20b_bisect_crash.log, 20f_headline_retry.log):
#   * maximin-2 and net-lookahead device-chunking runs clean and
#     bit-matches unchunked results (chunk 25/50 for maximin-2, 128 for
#     lookahead-1, 4 for lookahead-2) — but deep chunks of exactly 64
#     (the 64x64x64 games/roots/leaves shape) kernel-fault the worker,
#     so deep chunks are capped at DEEP_CHUNK_CAP.
#   * maximin-3 under an OUTER game lax.map (its root expansion is
#     itself an inner lax.map -> map-in-map inside the tournament
#     while_loop) crashed at n >= 200 games in the round-4 bisect, while
#     the round-3 full-vmap shape is proven clean to ~125 games.
#     Round-5 restructured depth-3 into the single-map node layout
#     (maximin_deep_batched below; DEEP3_BATCHED); depth >= 4 keeps the
#     nested-map per-game form and runs full-vmap in host-side segments
#     of <= SAFE_DEEP3_GAMES games.  Round-5 probes also showed the
#     faults are NOT deterministic shape thresholds (the round-4 nested
#     shape ran clean on 2026-08-21 while a flat n=1000 run faulted —
#     scripts/repro_map_in_map.py): treat every cap here as lowering
#     crash FREQUENCY, not as a proven-safe boundary.
DEEP_CHUNK_CAP = 50
SAFE_DEEP3_GAMES = 100


# Depth-3 maximin has a RESTRUCTURED device-chunked path since round 5
# (``maximin_deep_batched`` below: the root ply is folded into the chunk
# axis, so the compiled program has ONE lax.map level instead of the
# map-in-map that crashed the worker).  Flip to False to fall back to
# the round-4 host-segmentation behavior if a future jax build regresses.
DEEP3_BATCHED = True
# Round-5 chip bisect (scripts/repro_map_in_map.py; logs 46/48/49/49b +
# the beam-3 probe, log 54): the worker fault boundary tracks the TOTAL
# per-call expansion size — games x the whole serialized search tree —
# not program structure (chunk size / slab count / nesting all ruled
# out).  Calibration points, in the cost units below (plane boards = 1,
# net-evaluated leaves carry the same 16x factor as the live-cost
# table):
#   clean:  maximin-3 @ 200 games  = 52.4M   (250 also clean once)
#           beam-3(k=8) @ 100 games = 52.4M
#   crash:  maximin-3 @ 400+ games >= 105M  (repeatedly, any chunk)
#           beam-3 + maximin-3 @ 100 games = 78.6M
# Host segmentation bounds every program at the proven-clean total.
# MIXED programs (two DISTINCT deep searches in one program) fault at
# totals where pure programs are clean — depth-2 lookahead + maximin-3
# ran clean at 100 games/program throughout round 4 (32.8M units,
# n=1000 in segments) but crashed at 160 games = 52.4M (job 63), and
# beam-3 + maximin-3 crashed at 100 games = 78.6M (job 54) — so no
# single linear unit weighting fits both pure and mixed data; mixed
# programs get their own proven-clean cap.
TOTAL_EXPANSION_CAP = 200 * (64 ** 3)        # = 52.4M units (pure)
MIXED_EXPANSION_CAP = 100 * (64 ** 3 + 65536)  # = 32.8M units (mixed)


def device_chunk_unsafe(spec: str) -> bool:
    """True for policies whose per-game expansion cannot ride the outer
    game lax.map on TPU (nested lax.map root expansions — see the note
    above).  Depth-3 gets the restructured single-map batched path
    (``maximin_deep_batched``) instead; depth >= 4 roots still nest maps
    per game and stay host-segmented."""
    if spec.startswith("maximin-"):
        depth = int(spec.split("-")[1])
        return depth >= 4 or (depth == 3 and not DEEP3_BATCHED)
    return False


def total_cost_of_spec(spec: str, lookahead_depth: int = 0,
                       beam_k: int = 8) -> int:
    """Per-game TOTAL expansion cost — the whole serialized search tree,
    the quantity the TPU worker's size-boundary fault tracks (see the
    calibration table above).  For the net lookaheads total == live (all
    leaves in one batch); for deep maximin the tree serializes through
    lax.map so total (64^depth) far exceeds the live set.  Cheap
    policies return 0 (they don't constrain the segment)."""
    if lookahead_depth:
        return live_cost_of_spec(spec, lookahead_depth, beam_k)
    if spec.startswith("maximin-"):
        depth = int(spec.split("-")[1])
        return 64 ** depth if depth >= 2 else 0
    return 0


def host_segment_size(specs, num_games: int, cell_cost: int = 0) -> int:
    """Games per host-side program segment: ``num_games`` (one program)
    unless the specs' combined TOTAL expansion (entries may be spec
    strings or precomputed per-game costs) exceeds the proven-clean
    program size, or (a) a device-chunk-unsafe search is involved and
    the batch exceeds the safe full-vmap size, or (b) ``cell_cost`` > 0
    — a
    per-game live cost for stateful (recurrent) actors that cannot be
    device-chunked because their hidden threads live in the game loop
    carry; the segment is then bounded so ``segment * cell_cost`` fits
    the live budget (each segment starts its games' hiddens at zero, so
    host segmentation is exact for them)."""
    seg = num_games
    if num_games > SAFE_DEEP3_GAMES and any(
            isinstance(s, str) and device_chunk_unsafe(s)
            for s in specs):
        seg = SAFE_DEEP3_GAMES
    costs = [s if isinstance(s, int) else total_cost_of_spec(s)
             for s in specs]
    deep = [c for c in costs if c > 0]
    if deep:
        # Bound the program's TOTAL expansion at the proven-clean size
        # (pure vs mixed — see the cap notes above).
        cap = (MIXED_EXPANSION_CAP if len(deep) >= 2
               else TOTAL_EXPANSION_CAP)
        seg = min(seg, max(1, cap // sum(deep)))
    if cell_cost > 0:
        seg = min(seg, max(1, live_budget() // cell_cost))
    return seg


def maximin_deep_batched(cfg, num_games: int, chunk_override: int = 0):
    """Batched depth-3 maximin with the root ply folded into the chunk
    axis — the round-5 restructure of the shape that crashed the TPU
    worker (VERDICT r4 item 1c).

    The round-4 path chunked the GAME axis around the per-game policy,
    whose depth-3 root expansion is itself a ``lax.map`` — a map-in-map
    that kernel-faulted at n >= 200 games regardless of chunk size
    (data/logs/queue/19_diag_chunking.log).  Here the (games x 64 root
    moves) axes are flattened into ONE node axis first: each node is a
    root child board whose depth-2 maximin value is a plain 64x64 vmap
    expansion, and the node axis is evaluated in lax.map slabs of
    ``chunk`` nodes — a single map level, live memory ``chunk x 4096``
    boards, any game count.  Bit-identical to the per-game recursion
    (vmap/map associativity; gated by test_chunked_search).

    ``chunk_override``: 0 = auto from the cost model (capped at
    DEEP_CHUNK_CAP), >0 forced (same cap), <0 = one full vmap over all
    nodes (small batches only)."""
    from gymothelloenv_tpu.policies.scripted import (_BIG, _board_after,
                                                     _maximin_value)
    A = cfg.board_size * cfg.board_size
    n_nodes = num_games * A
    if chunk_override < 0:
        chunk = n_nodes
    else:
        chunk = chunk_override or auto_chunk(n_nodes, COST_MAXIMIN_DEEP)
        chunk = min(chunk or n_nodes, DEEP_CHUNK_CAP)

    def node_value(board, persp, me):
        return _maximin_value(board, persp, me, 2)

    def batched_act(keys, states):
        del keys
        n = states.turn.shape[0]
        actions = jnp.arange(A, dtype=jnp.int32)
        children = jax.vmap(lambda s: jax.vmap(
            lambda a: _board_after(s.board, s.turn, a))(actions))(states)
        flat_b = children.reshape((n * A,) + children.shape[2:])
        flat_p = jnp.repeat(-states.turn, A)
        flat_m = jnp.repeat(states.turn, A)
        m, r = divmod(n * A, chunk)
        parts = []
        if m > 0:
            slab = lambda x: x[:m * chunk].reshape(
                (m, chunk) + x.shape[1:])
            out = jax.lax.map(
                lambda t: jax.vmap(node_value)(*t),
                (slab(flat_b), slab(flat_p), slab(flat_m)))
            parts.append(out.reshape(-1))
        if r > 0:
            parts.append(jax.vmap(node_value)(
                flat_b[m * chunk:], flat_p[m * chunk:],
                flat_m[m * chunk:]))
        vals = (parts[0] if len(parts) == 1
                else jnp.concatenate(parts)).reshape(n, A)
        return jnp.argmax(jnp.where(states.legal, vals, -_BIG),
                          axis=1).astype(jnp.int32)

    batched_act.batched = True
    return batched_act


def live_cost_of_spec(spec: str, lookahead_depth: int = 0,
                      beam_k: int = 8) -> int:
    """Per-game live cost of a policy spec string (tournament CLI specs:
    ``rand | greedy | maximin-<k> | ckpt paths``).  ``lookahead_depth``
    overrides for net checkpoints evaluated with ``--lookahead``;
    depth 3 is the beam search (live = beam_k x the depth-2
    expansion)."""
    if lookahead_depth >= 3:
        return beam_k * COST_LOOKAHEAD_2
    if lookahead_depth == 2:
        return COST_LOOKAHEAD_2
    if lookahead_depth == 1:
        return COST_LOOKAHEAD_1
    if spec.startswith("maximin-"):
        depth = int(spec.split("-")[1])
        if depth <= 1:
            return COST_MAXIMIN_1
        return COST_MAXIMIN_DEEP
    return COST_CHEAP


def auto_chunk(num_games: int, cost: int, budget: int = None) -> int:
    """Largest chunk that keeps ``chunk * cost`` within ``budget``
    (default: the device-derived :func:`live_budget`; at least 1); 0
    means "no chunking needed" (the full batch fits).  Deep scripted
    searches are additionally capped at ``DEEP_CHUNK_CAP`` (see the note
    above)."""
    if budget is None:
        budget = live_budget()
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
                  chunk_override: int = 0, budget: int = None,
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
