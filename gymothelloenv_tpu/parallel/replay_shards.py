"""Per-shard prioritized replay — the scale-out alternative to the
replicated-replay design the sharded trainers default to (see
docs/DESIGN.md §6 for the decision).

Layout: every device owns a private ring (`agents.replay.Replay`) holding
only transitions its own env shard collected — capacity scales with the
mesh and inserts are local.  Sampling still follows the GLOBAL
prioritized distribution (the reference Memory's semantics, dqn.py:23-69)
via a two-stage scheme with static shapes and one tiny collective per
batch:

  1. *owner draw* (identical on every shard — shared key): for each of
     the ``batch`` slots, draw the owning shard from
     ``Categorical(P_1, ..., P_S)`` where ``P_s`` is shard s's priority
     total (an ``all_gather`` of S floats).
  2. *local candidate draw* (per-shard key): every shard samples
     ``batch`` candidates from its OWN prioritized ring (the same
     stratified proportional sampler the single-device path uses).
  3. *assembly*: slot j's row is the owner's candidate — a masked
     ``psum`` over the shard axis (each shard contributes its candidate
     rows where it owns the slot, zeros elsewhere).

Marginal correctness: P(slot j yields transition i on shard s)
= P(owner_j = s) * P(s's candidate_j = i) = (P_s / P) * (p_i / P_s)
= p_i / P — exactly the global proportional distribution, independent of
how transitions are distributed across shards.  (Within a shard the
candidates are stratified like the reference's segments; across shards
the allocation is multinomial — tests/test_replay_shards.py checks the
empirical marginals against the single-device sampler.)

Priority refresh: TD errors are computed from the assembled batch
(replicated after the psum), so every shard sees all ``batch`` errors and
scatters updates only at the slots it owns.

All functions here run INSIDE ``shard_map`` (they use
``jax.lax.axis_index`` / collectives over ``axis_name``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.agents.replay import (Replay, ReplayConfig,
                                             replay_sample_idx,
                                             replay_update_priorities)


def _local_priority_total(rb: Replay, cfg: ReplayConfig) -> jnp.ndarray:
    """This shard's sampling weight: priority mass (prioritized) or live
    size (uniform)."""
    if not cfg.prioritized:
        return rb.size.astype(jnp.float32)
    C = cfg.capacity
    live = jnp.arange(C) < rb.size
    return jnp.where(live, rb.priority[:C], 0.0).sum()


def sharded_sample(rb: Replay, cfg: ReplayConfig, key: jax.Array,
                   batch: int, axis_name: str = "data"):
    """Sample ``batch`` packed rows from the GLOBAL distribution over all
    shards' rings.  Returns ``(rows (batch, row_bytes) — identical on
    every shard, local_idx (batch,), owned (batch,) bool)``.

    ``key`` must be the SAME on every shard (fold your per-shard streams
    elsewhere); the owner draw uses it directly, the local candidate draw
    folds in the shard index.
    """
    shard = jax.lax.axis_index(axis_name)
    k_owner, k_local = jax.random.split(key)

    totals = jax.lax.all_gather(_local_priority_total(rb, cfg), axis_name)
    logits = jnp.log(jnp.maximum(totals, 1e-30))
    owner = jax.random.categorical(k_owner, logits, shape=(batch,))
    owned = owner == shard

    idx = replay_sample_idx(rb, cfg, jax.random.fold_in(k_local, shard),
                            batch)
    rows = rb.data[idx]
    rows = jnp.where(owned[:, None], rows, 0).astype(jnp.uint32)
    rows = jax.lax.psum(rows, axis_name).astype(jnp.uint8)
    return rows, idx, owned


def sharded_update_priorities(rb: Replay, cfg: ReplayConfig,
                              idx: jnp.ndarray, owned: jnp.ndarray,
                              errors: jnp.ndarray) -> Replay:
    """PER refresh for the slots this shard owns.  ``errors`` is the full
    (batch,) TD/KL vector (replicated after the psum-assembled batch);
    non-owned slots route to the scratch row ``capacity`` (never sampled,
    same trick as masked inserts)."""
    safe_idx = jnp.where(owned, idx, cfg.capacity)
    return replay_update_priorities(rb, cfg, safe_idx, errors)


def global_size(rb: Replay, axis_name: str = "data") -> jnp.ndarray:
    """Total live transitions across shards (inside shard_map)."""
    return jax.lax.psum(rb.size, axis_name)


# ---------------------------------------------------------------------------
# Trainer-facing drivers (DQNTrainer --replay-sharding per-shard): the
# per-shard replay lives as a STACKED pytree — every Replay leaf gains a
# leading (S,) axis sharded over 'data', so the ring data stays resident
# on its owning device and total capacity scales with the mesh.  The
# functions below wrap the shard_map blocks; they run inside the
# trainer's jitted chunk.

def stack_replays(cfg_per_shard: ReplayConfig, num_shards: int) -> Replay:
    """Fresh stacked per-shard replay: S identical empty rings."""
    from gymothelloenv_tpu.agents.replay import replay_init

    rb = replay_init(cfg_per_shard)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (num_shards,) + x.shape), rb)


def _stacked_specs(stacked):
    from jax.sharding import PartitionSpec as P

    return jax.tree.map(lambda _: P("data"), stacked)


def pershard_insert(mesh, stacked: Replay, cfg_per_shard: ReplayConfig,
                    em, stream_axis: int = 3) -> Replay:
    """Insert a collection chunk's emissions into the per-shard rings.

    ``em`` is the trainer's (T, slots, n, 2N, ...) ``Emitted`` pytree with
    the stream axis (2N) already GSPMD-sharded over 'data' — each shard
    flattens and inserts ONLY its local streams' rows, so no emission
    bytes cross the interconnect (the whole point of the per-shard
    layout)."""
    import functools

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def em_spec(leaf):
        spec = [None] * leaf.ndim
        spec[stream_axis] = "data"
        return P(*spec)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(_stacked_specs(stacked), jax.tree.map(em_spec, em)),
        out_specs=_stacked_specs(stacked), check_rep=False)
    def block(stacked, em):
        from gymothelloenv_tpu.agents.replay import replay_insert

        rb = jax.tree.map(lambda x: x[0], stacked)

        def flat(x):
            return x.reshape((-1,) + x.shape[stream_axis + 1:])

        rb = replay_insert(
            rb, cfg_per_shard, flat(em.board), flat(em.turn),
            flat(em.action), flat(em.reward), flat(em.next_board),
            flat(em.next_turn), flat(em.done), flat(em.valid))
        return jax.tree.map(lambda x: x[None], rb)

    return block(stacked, em)


def assert_ring_union_equal(ref_data, ref_size, shard_data, shard_sizes,
                            name: str = "per-shard rings"):
    """Correctness gate shared by tests/test_sharded_trainers.py and the
    ``dryrun_multichip`` driver entry (same pattern as
    ``sharding.assert_tree_allclose`` — one comparator so the gates
    can't drift): after a chunk collected with identical params, the
    union of the per-shard rings must hold exactly the replicated
    ring's rows (local-insert routing loses/duplicates nothing), with
    every shard non-empty."""
    import numpy as np

    ref_rows = np.asarray(ref_data)[:int(np.asarray(ref_size))]
    sizes = np.asarray(shard_sizes)
    assert sizes.sum() == ref_rows.shape[0] > 0, (name, sizes)
    assert (sizes > 0).all(), (name, sizes)
    rows = np.concatenate([np.asarray(shard_data)[s, :sizes[s]]
                           for s in range(sizes.shape[0])])

    def sort_rows(r):
        return r[np.lexsort(r.T[::-1])]

    np.testing.assert_array_equal(sort_rows(ref_rows), sort_rows(rows),
                                  err_msg=name)


def pershard_train_batch(state, stacked: Replay,
                         cfg_per_shard: ReplayConfig, batch_size: int,
                         loss_grads, optimizer, key: jax.Array, mesh):
    """Generic per-shard minibatch update: globally prioritized sample
    (owner-multinomial x local-stratified), DP gradients over contiguous
    batch slices, full-batch PER refresh scattered back to owning
    shards.  ``loss_grads(state, batch_tuple, key) -> ((loss, errors),
    grads)`` supplies the algorithm (DQN Huber-TD or Rainbow C51-KL
    cores below); returns (state, stacked, loss)."""
    import functools

    import optax
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from gymothelloenv_tpu.agents.replay import unpack_rows

    S = mesh.shape["data"]
    if batch_size % S:
        raise ValueError(f"batch_size {batch_size} not divisible by "
                         f"data shards {S}")
    b_local = batch_size // S

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), _stacked_specs(stacked), P()),
        out_specs=(P(), P(), _stacked_specs(stacked)),
        check_rep=False)
    def block(state, stacked, key):
        k_sample, k_loss = jax.random.split(key)
        rb = jax.tree.map(lambda x: x[0], stacked)
        rows, idx, owned = sharded_sample(rb, cfg_per_shard, k_sample,
                                          batch_size)
        full = unpack_rows(rows, cfg_per_shard.board_size)

        # DP: each data shard grads its contiguous slice of the
        # (replicated) assembled batch, then all-reduces.
        shard = jax.lax.axis_index("data")

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, shard * b_local,
                                                b_local, 0)

        (loss, err), grads = loss_grads(state, tuple(map(sl, full)),
                                        k_loss)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        if cfg_per_shard.prioritized:
            # Contiguous slices all_gather back into slot order.
            err_full = jax.lax.all_gather(err, "data", tiled=True)
            rb = sharded_update_priorities(rb, cfg_per_shard, idx, owned,
                                           err_full)
        return grads, loss, jax.tree.map(lambda x: x[None], rb)

    grads, loss, stacked = block(state, stacked, key)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=opt_state), stacked, loss


def dqn_train_batch_pershard(state, stacked: Replay, cfg,
                             cfg_per_shard: ReplayConfig, apply_fn,
                             optimizer, key: jax.Array, mesh):
    """Per-shard drop-in for ``agents.dqn.dqn_train_batch``."""
    from gymothelloenv_tpu.agents.dqn import dqn_loss_grads

    def lg(state, batch, k):
        del k   # the DQN core is noise-free
        return dqn_loss_grads(state, cfg, apply_fn, batch)

    return pershard_train_batch(state, stacked, cfg_per_shard,
                                cfg.batch_size, lg, optimizer, key, mesh)


def rainbow_train_batch_pershard(state, stacked: Replay, cfg,
                                 cfg_per_shard: ReplayConfig, apply_fn,
                                 optimizer, key: jax.Array, mesh):
    """Per-shard drop-in for ``agents.rainbow.rainbow_train_batch``
    (noisy-net key replicated across shards — one noise draw per batch,
    same as the replicated layout)."""
    from gymothelloenv_tpu.agents.rainbow import rainbow_loss_grads

    def lg(state, batch, k):
        return rainbow_loss_grads(state, cfg, apply_fn, batch, k)

    return pershard_train_batch(state, stacked, cfg_per_shard,
                                cfg.batch_size, lg, optimizer, key, mesh)
