"""Fused whole-rollout Pallas kernel (ops/pallas_rollout.py) — interpret
mode on CPU; native on TPU via scripts/bench_pallas.py."""

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import bitboard as bb
from gymothelloenv_tpu.ops import pallas_rollout as pr


def test_popcount_swar_matches_lax():
    rng = np.random.RandomState(0)
    v = jnp.asarray(rng.randint(0, 2 ** 32, (8, 64), np.uint64)
                    .astype(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(pr._popcount(v)),
        np.asarray(jax.lax.population_count(v)).astype(np.int32))


def test_opening_constants_match_bit_reset():
    s = bb.bit_reset()
    assert int(s.black[0]) == int(pr._INIT_C0)
    assert int(s.black[1]) == int(pr._INIT_C1)
    assert int(s.white[0]) == int(pr._INIT_O0)
    assert int(s.white[1]) == int(pr._INIT_O1)
    assert int(s.legal[0]) == int(pr._INIT_L0)
    assert int(s.legal[1]) == int(pr._INIT_L1)


def test_sample_legal_uniform_and_legal():
    rng = np.random.RandomState(1)
    cells = rng.randint(0, 3, (64, 8, 8))
    l0, l1 = bb.legal_mask2(bb.pack2(jnp.asarray(cells == 1)),
                            bb.pack2(jnp.asarray(cells == 2)))
    has = np.asarray((l0 | l1) != 0)
    legal_flat = np.asarray(bb.unpack2((l0, l1))).reshape(64, 64)
    counts = np.zeros((64, 64))
    trials = 400
    for t in range(trials):
        r = jnp.asarray(rng.randint(0, 2 ** 32, (64,), np.uint64)
                        .astype(np.uint32))
        oh0, oh1 = pr._sample_legal(r, l0, l1)
        a = np.asarray(bb.unpack2((oh0, oh1))).reshape(64, 64)
        assert (a.sum(-1) == 1)[has].all()          # exactly one bit
        assert (a[has] <= legal_flat[has]).all()    # and it is legal
        counts += a
    for i in range(0, 64, 9):
        n = legal_flat[i].sum()
        if n < 2:
            continue
        freq = counts[i][legal_flat[i].astype(bool)]
        expect = trials / n
        assert abs(freq - expect).max() < 6 * np.sqrt(expect), (i, freq)


def test_rollout_chunk_invariants_interpret():
    """150 plies x 128 games in interpret mode: state invariants hold and
    the episode count matches the ~61-ply game-length statistic."""
    n, steps = 128, 150
    state = pr.rollout_init(n)
    state, eps = pr.rollout_chunk(state, jnp.int32(7), steps,
                                  interpret=True)
    c, o, legal = state.cur, state.opp, state.legal
    # Disjoint disk sets, >= 4 disks on board.
    assert int(jnp.sum((c[0] & o[0]) | (c[1] & o[1]))) == 0
    disks = np.asarray(pr._popcount(c[0]) + pr._popcount(c[1])
                       + pr._popcount(o[0]) + pr._popcount(o[1]))
    assert (disks >= 4).all() and (disks <= 64).all()
    # Stored legal mask == recomputed legal mask, and nonempty (auto-reset
    # guarantees a playable state).
    r0, r1 = bb.legal_mask2(c, o)
    np.testing.assert_array_equal(np.asarray(legal[0]), np.asarray(r0))
    np.testing.assert_array_equal(np.asarray(legal[1]), np.asarray(r1))
    assert bool(jnp.all((legal[0] | legal[1]) != 0))
    # Episode completions ~ n * steps / mean-game-length.
    expect = n * steps / 61.0
    assert 0.6 * expect < int(eps) < 1.5 * expect, (int(eps), expect)


def test_rollout_chunk_resumes_across_calls():
    n = 64
    state = pr.rollout_init(n)
    state, e1 = pr.rollout_chunk(state, jnp.int32(1), 80, interpret=True)
    state, e2 = pr.rollout_chunk(state, jnp.int32(2), 80, interpret=True)
    r0, r1 = bb.legal_mask2(state.cur, state.opp)
    np.testing.assert_array_equal(np.asarray(state.legal[0]),
                                  np.asarray(r0))
    assert int(e1) > 0 and int(e2) > 0


def test_rollout_chunk_sharded_matches_per_device_runs():
    """shard_map composition over the 8-device CPU mesh: every device runs
    the kernel on its lane shard with a device-indexed seed; the result
    must equal running the kernel shard-by-shard manually, and the episode
    count must be the global psum."""
    from gymothelloenv_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(8)     # ('data': 8, 'model': 1)
    n, steps = 8 * 64, 80           # 8 lanes per device; >1 game length
    state = pr.rollout_init(n)
    out_state, eps = pr.rollout_chunk_sharded(
        state, 5, steps, mesh, axis="data", interpret=True)

    cols = state.cur[0].shape[1]
    per = cols // 8
    want_eps = 0
    for d in range(8):
        sl = slice(d * per, (d + 1) * per)
        shard = pr.RolloutState(
            cur=(state.cur[0][:, sl], state.cur[1][:, sl]),
            opp=(state.opp[0][:, sl], state.opp[1][:, sl]),
            legal=(state.legal[0][:, sl], state.legal[1][:, sl]))
        got, e = pr.rollout_chunk(shard, jnp.int32(5 + d * 7919), steps,
                                  interpret=True)
        want_eps += int(e)
        np.testing.assert_array_equal(np.asarray(out_state.cur[0][:, sl]),
                                      np.asarray(got.cur[0]))
        np.testing.assert_array_equal(np.asarray(out_state.opp[1][:, sl]),
                                      np.asarray(got.opp[1]))
        np.testing.assert_array_equal(
            np.asarray(out_state.legal[0][:, sl]),
            np.asarray(got.legal[0]))
    assert int(eps) == want_eps > 0


def test_rollout_chunks_scanned_matches_sequential_chunks():
    """The single-dispatch scan harness == sequential rollout_chunk calls
    with seeds seed0+i (the bench.py measurement path)."""
    n, steps, chunks = 128, 40, 3
    state0 = pr.rollout_init(n)
    got, total = pr.rollout_chunks_scanned(state0, 9, chunks, steps,
                                           interpret=True)
    want = pr.rollout_init(n)
    want_total = 0
    for i in range(chunks):
        want, eps = pr.rollout_chunk(want, jnp.int32(9 + i), steps,
                                     interpret=True)
        want_total += int(eps)
    np.testing.assert_array_equal(np.asarray(got.cur[0]),
                                  np.asarray(want.cur[0]))
    np.testing.assert_array_equal(np.asarray(got.legal[1]),
                                  np.asarray(want.legal[1]))
    assert int(total) == want_total > 0
