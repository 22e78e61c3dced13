"""Sampling-distribution correctness of the per-shard prioritized replay
(parallel/replay_shards.py) against the single-device replay.

The claim under test: per-shard rings + (owner multinomial x local
stratified) sampling reproduce the GLOBAL proportional distribution
``p_i / P`` — the same marginals as the reference-semantics single-device
sampler — regardless of how transitions are spread over shards.
"""

import functools
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from gymothelloenv_tpu.agents.replay import (Replay, ReplayConfig,
                                             replay_gather, replay_init,
                                             replay_insert,
                                             replay_sample_idx)
from gymothelloenv_tpu.parallel import make_mesh
from gymothelloenv_tpu.parallel.replay_shards import (
    global_size, sharded_sample, sharded_update_priorities)

S = 8            # shards
PER = 64         # transitions per shard
N_IDS = S * PER  # global transition ids
BATCH = 256
CFG = ReplayConfig(capacity=128, prioritized=True)


def _build_shard_replays(key):
    """Per-shard replays whose rows encode a global id in the action
    field; priorities ~ lognormal (heavy-tailed, shard totals diverge)."""
    replays = []
    priorities = []
    B = CFG.board_size
    for s in range(S):
        rb = replay_init(CFG)
        ids = jnp.arange(s * PER, (s + 1) * PER, dtype=jnp.int32)
        z = jnp.zeros((PER, B, B), jnp.int8)
        t = jnp.zeros((PER,), jnp.int8)
        rb = replay_insert(rb, CFG, z, t, ids, jnp.zeros((PER,)),
                           z, t, jnp.zeros((PER,), bool),
                           jnp.ones((PER,), bool))
        key, k = jax.random.split(key)
        p = jnp.exp(jax.random.normal(k, (PER,)))
        rb = rb.replace(priority=rb.priority.at[:PER].set(p))
        replays.append(rb)
        priorities.append(p)
    return replays, jnp.concatenate(priorities)


def _stack(replays):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *replays)


def test_sharded_sample_matches_global_distribution():
    mesh = make_mesh(8)
    replays, prio = _build_shard_replays(jax.random.PRNGKey(0))
    stacked = _stack(replays)

    spec = jax.tree.map(lambda _: P("data"), stacked)

    @functools.partial(
        jax.jit, static_argnums=())
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, P()), out_specs=(P(None), P("data"), P("data")),
        check_rep=False)
    def sample(stacked, key):
        rb = jax.tree.map(lambda x: x[0], stacked)
        rows, idx, owned = sharded_sample(rb, CFG, key, BATCH)
        return rows[None], idx[None], owned[None]

    # Decode ids via the single-device unpack (same codec).
    probe = replay_init(ReplayConfig(capacity=max(BATCH, 512),
                                     prioritized=True))

    def decode(rows):
        rb = probe.replace(data=probe.data.at[:BATCH].set(rows))
        _, _, action, *_ = replay_gather(rb, jnp.arange(BATCH))
        return action

    counts = np.zeros(N_IDS, np.int64)
    owned_total = 0
    ROUNDS = 150
    for r in range(ROUNDS):
        rows, idx, owned = sample(stacked, jax.random.PRNGKey(100 + r))
        ids = np.asarray(decode(rows[0]))
        assert ids.min() >= 0 and ids.max() < N_IDS
        np.add.at(counts, ids, 1)
        # Exactly one shard owns each slot.
        owned_total += int(np.asarray(owned).sum())
    assert owned_total == ROUNDS * BATCH

    total_draws = ROUNDS * BATCH
    expect = np.asarray(prio / prio.sum()) * total_draws
    # Normal-approx gate: every id within 6 sigma of its expectation,
    # plus an aggregate chi-square-per-dof sanity bound.
    sigma = np.sqrt(np.maximum(expect, 1.0))
    assert np.all(np.abs(counts - expect) < 6 * sigma + 6), \
        np.abs((counts - expect) / sigma).max()
    chi2_dof = float(((counts - expect) ** 2 / np.maximum(expect, 1e-9))
                     .mean())
    assert chi2_dof < 2.0, chi2_dof

    # Cross-check: the single-device sampler over the UNION replay agrees
    # with the same theoretical marginals (so both paths are the same
    # distribution, transitively).
    union = replay_init(ReplayConfig(capacity=1024, prioritized=True))
    B = CFG.board_size
    z = jnp.zeros((N_IDS, B, B), jnp.int8)
    t = jnp.zeros((N_IDS,), jnp.int8)
    union = replay_insert(union, ReplayConfig(capacity=1024,
                                              prioritized=True),
                          z, t, jnp.arange(N_IDS, dtype=jnp.int32),
                          jnp.zeros((N_IDS,)), z, t,
                          jnp.zeros((N_IDS,), bool),
                          jnp.ones((N_IDS,), bool))
    union = union.replace(priority=union.priority.at[:N_IDS].set(prio))
    ucfg = ReplayConfig(capacity=1024, prioritized=True)
    ucounts = np.zeros(N_IDS, np.int64)
    sample_u = jax.jit(lambda k: replay_sample_idx(union, ucfg, k, BATCH))
    for r in range(ROUNDS):
        idx = np.asarray(sample_u(jax.random.PRNGKey(300 + r)))
        np.add.at(ucounts, idx, 1)
    chi2_dof_u = float(((ucounts - expect) ** 2
                        / np.maximum(expect, 1e-9)).mean())
    assert chi2_dof_u < 2.0, chi2_dof_u


def test_sharded_priority_update_and_size():
    mesh = make_mesh(8)
    replays, _ = _build_shard_replays(jax.random.PRNGKey(1))
    stacked = _stack(replays)
    spec = jax.tree.map(lambda _: P("data"), stacked)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec, P()), out_specs=(spec, P(None)),
        check_rep=False)
    def update(stacked, key):
        rb = jax.tree.map(lambda x: x[0], stacked)
        rows, idx, owned = sharded_sample(rb, CFG, key, BATCH)
        errors = jnp.abs(jnp.sin(jnp.arange(BATCH, dtype=jnp.float32)))
        rb = sharded_update_priorities(rb, CFG, idx, owned, errors)
        gsize = global_size(rb)
        return (jax.tree.map(lambda x: x[None], rb), gsize[None])

    out, gsize = jax.jit(update)(stacked, jax.random.PRNGKey(7))
    assert int(gsize[0]) == N_IDS
    # Owned slots got (|err| + e)^a; scratch rows stayed untouched at 0 on
    # the priority column's tail beyond capacity usage.
    new_prio = np.asarray(out.priority)
    assert new_prio.shape == (S, CFG.capacity + 1)
    expected_vals = (np.abs(np.sin(np.arange(BATCH))) + CFG.priority_e) \
        ** CFG.priority_a
    # Every updated live priority must be one of the expected values.
    changed = 0
    old_prio = np.asarray(_stack(replays).priority)
    for s in range(S):
        diff = np.nonzero(new_prio[s, :PER] != old_prio[s, :PER])[0]
        for i in diff:
            assert np.any(np.isclose(new_prio[s, i], expected_vals,
                                     atol=1e-6)), new_prio[s, i]
        changed += len(diff)
    assert changed > 0
