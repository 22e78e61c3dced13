"""Round-4 search scalability + recurrent-eval tests.

Covers the memory-bounded chunked policy evaluation
(policies/chunking.py — the fix for the round-3 maximin-3 OOM
regression), the depth-2 net value lookahead, and the generalized
stateful tournament runner (recurrent head-to-head opponents, recurrent
lookahead cell).
"""

import functools

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.featurize import make_state
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.policies import maximin_policy, random_policy
from gymothelloenv_tpu.policies.chunking import (auto_chunk,
                                                 chunked_batched,
                                                 live_cost_of_spec,
                                                 maybe_chunked)
from gymothelloenv_tpu.train import play_games
from gymothelloenv_tpu.train.tournament import play_games_impl

CFG = EnvConfig()
RCFG = EnvConfig(num_disk_as_reward=True)


def random_states(n, seed=0, plies=12):
    """A batch of states reached by ``plies`` random legal moves."""
    key = jax.random.PRNGKey(seed)

    def gen(key):
        s = core.reset(CFG)

        def body(carry, k):
            s = carry
            logits = jnp.where(s.legal, 0.0, -jnp.inf)
            a = jax.random.categorical(k, logits).astype(jnp.int32)
            s2 = core.step(s, a, CFG).state
            s = jax.tree.map(
                lambda new, old: jnp.where(s.terminated, old, new), s2, s)
            return s, None
        s, _ = jax.lax.scan(body, s, jax.random.split(key, plies))
        return s

    return jax.vmap(gen)(jax.random.split(key, n))


def test_chunked_maximin_matches_vmap():
    """lax.map-chunked maximin-2 == full-vmap maximin-2, exactly, with
    the padding path exercised (7 games, chunk 3)."""
    states = random_states(7, seed=4)
    keys = jax.random.split(jax.random.PRNGKey(0), 7)
    act = maximin_policy(2, CFG)
    plain = jax.jit(jax.vmap(act))(keys, states)
    chunked = jax.jit(chunked_batched(act, 3))(keys, states)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(chunked))


@pytest.mark.slow
def test_chunked_tournament_matches_unchunked():
    """play_games with a chunked deep search == the unchunked program at
    the same key (the chunking must be invisible to results)."""
    key = jax.random.PRNGKey(7)
    mm2 = maximin_policy(2, CFG)
    w_plain = play_games(key, CFG, mm2, random_policy, num_games=10,
                         init_rand_steps=4)
    w_chunk = jax.jit(lambda k: play_games_impl(
        k, CFG, chunked_batched(mm2, 4), random_policy, 10, 4))(key)
    np.testing.assert_array_equal(np.asarray(w_plain),
                                  np.asarray(w_chunk))


def test_auto_chunk_cost_model():
    assert live_cost_of_spec("rand") == 1
    assert live_cost_of_spec("greedy") == 1
    assert live_cost_of_spec("maximin-1") == 64
    assert live_cost_of_spec("maximin-2") == 4096
    assert live_cost_of_spec("maximin-3") == 4096
    assert live_cost_of_spec("", lookahead_depth=1) == 2048
    assert live_cost_of_spec("", lookahead_depth=2) == 65536
    # Small programs aren't chunked; big ones are bounded; deep-search
    # chunks are capped below the 64-game shape (DEEP_CHUNK_CAP — the
    # 64x64x64 expansion crashes the TPU worker, see chunking.py).
    assert auto_chunk(50, 4096) == 0
    assert auto_chunk(1000, 4096) == 50
    assert auto_chunk(1000, 2048) == 128
    assert auto_chunk(1000, 65536) == 4
    assert auto_chunk(10**6, 10**9) == 1
    # maybe_chunked wiring: cheap or small => identity.
    act = maximin_policy(2, CFG)
    assert maybe_chunked(act, 50, 4096) is act
    assert maybe_chunked(act, 1000, 4096, chunk_override=-1) is act
    assert getattr(maybe_chunked(act, 1000, 4096), "batched", False)


def _stub_apply(params, obs):
    """Value head = disk diff from the to-move player's perspective."""
    diff = obs[:, 0].sum((1, 2)) - obs[:, 1].sum((1, 2))
    turn = 2.0 * obs[:, 2, 0, 0] - 1.0
    return None, diff * turn, None


def _explicit_lookahead2(s):
    """Straightforward per-move Python expansion of the depth-2 value
    lookahead (independent coding of the same contract)."""
    legal = np.flatnonzero(np.asarray(s.legal))
    best_val, best_a = -1e18, None
    for a in legal:
        res1 = core.step(s, jnp.int32(a), RCFG)
        c = res1.state
        if bool(c.terminated):
            val = float(res1.reward)
        else:
            vals2 = []
            for b in np.flatnonzero(np.asarray(c.legal)):
                res2 = core.step(c, jnp.int32(b), RCFG)
                g = res2.state
                if bool(g.terminated):
                    v = float(res2.reward)
                    v = v if int(c.turn) == int(s.turn) else -v
                else:
                    obs = jnp.asarray(
                        np.asarray(make_state(g), np.float32)[None])
                    _, vv, _ = _stub_apply(None, obs)
                    vv = float(vv[0])
                    v = vv if int(g.turn) == int(s.turn) else -vv
                vals2.append(v)
            val = (max(vals2) if int(c.turn) == int(s.turn)
                   else min(vals2))
        if val > best_val:
            best_val, best_a = val, int(a)
    return best_a


@pytest.mark.slow
def test_net_lookahead_depth2_matches_explicit_expansion():
    from gymothelloenv_tpu.train.ppo_trainer import net_lookahead_policy

    act = jax.jit(net_lookahead_policy(None, _stub_apply, RCFG, depth=2))
    key = jax.random.PRNGKey(5)
    s = core.reset(RCFG)
    checked = 0
    for ply in range(60):
        if bool(s.terminated):
            break
        got = int(act(key, s))
        want = _explicit_lookahead2(s)
        assert got == want, (ply, got, want)
        checked += 1
        legal = np.flatnonzero(np.asarray(s.legal))
        key, k = jax.random.split(key)
        a = int(legal[jax.random.randint(k, (), 0, len(legal))])
        s = core.step(s, jnp.int32(a), RCFG).state
    assert checked >= 20


def test_lookahead_depth2_chunked_matches_plain():
    from gymothelloenv_tpu.train.ppo_trainer import net_lookahead_policy

    act = net_lookahead_policy(None, _stub_apply, RCFG, depth=2)
    states = random_states(5, seed=9)
    keys = jax.random.split(jax.random.PRNGKey(1), 5)
    plain = jax.jit(jax.vmap(act))(keys, states)
    chunked = jax.jit(chunked_batched(act, 2))(keys, states)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(chunked))


def _pseudo_recurrent_apply(net, ff_apply):
    """Wrap a feed-forward apply as an h-ignoring recurrent-signature
    apply: the hidden thread is inert, so stateful-runner results must
    match the stateless path exactly."""
    def apply_fn(params, obs, h, mask):
        logits, value, _ = ff_apply(params, obs)
        return logits, value, h
    apply_fn.hidden_size = 4
    apply_fn.recurrent = True
    return apply_fn


def _small_net():
    from gymothelloenv_tpu.train.ppo_trainer import (make_apply_fn,
                                                     make_network)
    net = make_network(RCFG)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)))
    return net, params, make_apply_fn(net)


def test_recurrent_opponent_matches_stateless_when_hidden_inert():
    """play_games_recurrent with an opp_cell whose hidden is inert must
    reproduce the stateless-opponent program bit-for-bit (same key
    stream, same logits => same actions)."""
    from gymothelloenv_tpu.train.ppo_trainer import (
        net_sampling_cell, net_tournament_policy, play_games_recurrent)

    net, params, ff_apply = _small_net()
    rec_apply = _pseudo_recurrent_apply(net, ff_apply)

    # Protagonist: the same net as a pseudo-recurrent actor; opponent in
    # both runs is ANOTHER copy of the net, once stateless and once as an
    # inert-hidden cell.
    key = jax.random.PRNGKey(3)
    w_stateless = jax.jit(lambda k: play_games_recurrent(
        k, RCFG, params, rec_apply,
        net_tournament_policy(params, ff_apply), 8, -1, 4, 4))(key)
    w_cell = jax.jit(lambda k: play_games_recurrent(
        k, RCFG, params, rec_apply, None, 8, -1, 4, 4,
        opp_cell=net_sampling_cell(params, rec_apply),
        opp_hidden_size=4))(key)
    np.testing.assert_array_equal(np.asarray(w_stateless),
                                  np.asarray(w_cell))


def test_recurrent_lookahead_cell_matches_ff_lookahead():
    """With an inert hidden, the recurrent lookahead cell must pick the
    same action the feed-forward lookahead picks."""
    from gymothelloenv_tpu.train.ppo_trainer import (
        net_lookahead_cell_recurrent, net_lookahead_policy)

    net, params, ff_apply = _small_net()
    rec_apply = _pseudo_recurrent_apply(net, ff_apply)
    cell = net_lookahead_cell_recurrent(params, rec_apply, RCFG)
    ff_act = net_lookahead_policy(params, ff_apply, RCFG)

    states = random_states(6, seed=13)
    keys = jax.random.split(jax.random.PRNGKey(2), 6)
    h = jnp.zeros((6, 4))
    a_cell, h_out = jax.jit(cell)(keys, states, h)
    a_ff = jax.jit(jax.vmap(ff_act))(keys, states)
    np.testing.assert_array_equal(np.asarray(a_cell), np.asarray(a_ff))
    assert h_out.shape == (6, 4)


def test_recurrent_lookahead_depth2_rejected():
    import pytest

    from gymothelloenv_tpu.train.ppo_trainer import (
        net_lookahead_cell_recurrent)
    with pytest.raises(NotImplementedError, match="depth 1"):
        net_lookahead_cell_recurrent(None, None, RCFG, depth=2)


def test_real_recurrent_head_to_head_runs():
    """A REAL GRU checkpoint pair as protagonist and opponent: the
    stateful runner threads two independent hidden streams; all games
    must terminate with valid winners."""
    from gymothelloenv_tpu.train.ppo_trainer import (
        make_apply_fn_recurrent, make_network, net_sampling_cell,
        play_games_recurrent)

    H = 16
    net = make_network(RCFG, recurrent=True, hidden_size=H)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    init = lambda k: net.init(k, jnp.zeros((1, 4, 8, 8)),
                              jnp.zeros((1, H)), jnp.ones((1,)))
    p1, p2 = init(k1), init(k2)
    apply_fn = make_apply_fn_recurrent(net)

    w = jax.jit(lambda k: play_games_recurrent(
        k, RCFG, p1, apply_fn, None, 6, -1, 4, H,
        opp_cell=net_sampling_cell(p2, apply_fn),
        opp_hidden_size=H))(jax.random.PRNGKey(9))
    w = np.asarray(w)
    assert w.shape == (6,)
    assert set(np.unique(w)).issubset({-1, 0, 1})


def test_opp_lookahead_cli():
    """--opp-lookahead-depth gives a CHECKPOINT opponent the value-
    lookahead operator (best-vs-best head-to-heads); scripted opponents
    reject the flag."""
    import contextlib
    import io

    from gymothelloenv_tpu.cli import eval_checkpoint

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_checkpoint.main([
            "--load", "data/selfplay/ppo_fast4096_500.msgpack",
            "--opponent", "ckpt:data/selfplay/ppo_fast4096_500.msgpack",
            "--opp-lookahead-depth", "1", "--games", "4", "--seed", "3"])
    assert "over 4 games" in buf.getvalue()

    with pytest.raises(SystemExit):
        eval_checkpoint.main([
            "--load", "data/selfplay/ppo_fast4096_500.msgpack",
            "--opponent", "greedy",
            "--opp-lookahead-depth", "1", "--games", "4"])


def test_host_segmentation(monkeypatch):
    """The eval CLI splits device-chunk-unsafe programs into host-side
    segments and pools tallies.  Exercised cheaply by flagging 'greedy'
    as device-chunk-unsafe with a tiny safe size — 6 games over segments
    of 2+1 per color must still report totals over 6 games."""
    import contextlib
    import io

    import gymothelloenv_tpu.policies.chunking as chunking
    from gymothelloenv_tpu.cli import eval_checkpoint
    from gymothelloenv_tpu.policies.chunking import host_segment_size

    # Depth-3 is device-chunkable since the round-5 restructure
    # (maximin_deep_batched) up to the chip-bisected TOTAL-expansion
    # program ceiling; combined deep pairings shrink the segment
    # accordingly (the beam-3 + maximin-3 program at 100 games crashed,
    # log 54 — its seg is now 66).
    assert host_segment_size(("maximin-3",), 1000) == 200
    assert host_segment_size(("maximin-3",), 150) == 150
    # Deep-vs-deep pairings take the (conservative) mixed cap too.
    assert host_segment_size(("maximin-3", "maximin-3"), 1000) == 62
    assert host_segment_size(("maximin-2",), 1000) == 1000
    assert host_segment_size(
        (chunking.total_cost_of_spec("", lookahead_depth=3, beam_k=8),
         "maximin-3"), 100) == 41
    # Mixed int-cost + spec-string entries at n > SAFE_DEEP3_GAMES (the
    # shape job 56 crashed on: ints must not reach device_chunk_unsafe).
    # Mixed deep programs use the tighter MIXED_EXPANSION_CAP (job-63
    # crash at 160 games; round-4 proved 100 clean at n=1000 total).
    assert host_segment_size(
        (chunking.total_cost_of_spec("", lookahead_depth=2),
         "maximin-3"), 500) == 100
    # Depth-4's total tree (64^4/game) bounds segments to 3 games —
    # slow but inside the proven envelope (never chip-tested at more).
    assert host_segment_size(("maximin-4",), 1000) == 3
    monkeypatch.setattr(chunking, "DEEP3_BATCHED", False)
    assert host_segment_size(("maximin-3",), 1000) == 100  # fallback
    monkeypatch.setattr(chunking, "DEEP3_BATCHED", True)
    # Recurrent-lookahead cell cost bounds the segment through the live
    # budget (ADVICE r4: these programs bypassed the cost model).
    budget = chunking.live_budget()
    assert host_segment_size((), 10**6,
                             cell_cost=chunking.COST_LOOKAHEAD_1) == \
        budget // chunking.COST_LOOKAHEAD_1
    assert host_segment_size((), 10, cell_cost=chunking.COST_LOOKAHEAD_1) \
        == 10

    monkeypatch.setattr(chunking, "SAFE_DEEP3_GAMES", 2)
    monkeypatch.setattr(chunking, "device_chunk_unsafe",
                        lambda spec: spec == "greedy")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_checkpoint.main([
            "--load", "data/selfplay/ppo_fast4096_500.msgpack",
            "--opponent", "greedy", "--games", "6", "--seed", "3"])
    assert "over 6 games" in buf.getvalue()


@pytest.mark.slow
def test_maximin_deep_batched_matches_per_game():
    """The restructured depth-3 path (root ply folded into the node
    axis, one lax.map level) is bit-identical to the per-game recursion
    — including the remainder (r > 0) slab and a forced tiny chunk."""
    from gymothelloenv_tpu.policies.chunking import maximin_deep_batched

    n = 3
    states = random_states(n, seed=21, plies=40)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    plain = jax.jit(jax.vmap(maximin_policy(3, CFG)))(keys, states)
    for chunk in (50, 7, -1):
        batched = maximin_deep_batched(CFG, n, chunk_override=chunk)
        assert batched.batched
        got = jax.jit(batched)(keys, states)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(got),
                                      err_msg=f"chunk={chunk}")


def test_policy_from_spec_deep3_routes_to_batched(monkeypatch):
    import gymothelloenv_tpu.policies.chunking as chunking
    from gymothelloenv_tpu.cli.tournament import policy_from_spec

    act = policy_from_spec("maximin-3", CFG, num_games=500,
                           expand_chunk=0)
    assert getattr(act, "batched", False)
    # Explicit full-vmap override and the fallback flag keep the old
    # per-game act (host segmentation bounds it instead).
    assert not getattr(policy_from_spec("maximin-3", CFG, num_games=500,
                                        expand_chunk=-1),
                       "batched", False)
    monkeypatch.setattr(chunking, "DEEP3_BATCHED", False)
    assert not getattr(policy_from_spec("maximin-3", CFG, num_games=500,
                                        expand_chunk=0),
                       "batched", False)


@pytest.mark.slow
def test_deep_policy_shape_sweep(monkeypatch):
    """Stress the chunking shape logic (VERDICT r4 item 1d): odd batch
    sizes x odd chunk sizes for every deep policy family must reproduce
    the unchunked program exactly — head slabs, remainders, chunk > n,
    chunk == n, chunk 1."""
    from gymothelloenv_tpu.train.ppo_trainer import net_lookahead_policy

    mm2 = maximin_policy(2, CFG)
    la1 = net_lookahead_policy(None, _stub_apply, RCFG, depth=1)
    la2 = net_lookahead_policy(None, _stub_apply, RCFG, depth=2)
    for name, act, sizes in (("maximin-2", mm2, (7, 13)),
                             ("lookahead-1", la1, (7, 13)),
                             ("lookahead-2", la2, (5,))):
        for n in sizes:
            states = random_states(n, seed=100 + n)
            keys = jax.random.split(jax.random.PRNGKey(n), n)
            plain = jax.jit(jax.vmap(act))(keys, states)
            for chunk in (1, 2, 3, n - 1, n, n + 1):
                got = jax.jit(chunked_batched(act, chunk))(keys, states)
                np.testing.assert_array_equal(
                    np.asarray(plain), np.asarray(got),
                    err_msg=f"{name} n={n} chunk={chunk}")


def test_eval_cli_recurrent_armed_opponent():
    """--opp-lookahead-depth 1 with a RECURRENT checkpoint opponent, for
    both recurrent and feed-forward protagonists (ADVICE r4: only the
    ff-vs-ff armed path was covered)."""
    import contextlib
    import io

    from gymothelloenv_tpu.cli import eval_checkpoint

    rec = "data/selfplay/ppo_recurrent_2000.msgpack"
    ff = "data/selfplay/ppo_fast4096_500.msgpack"
    for prot in (rec, ff):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            eval_checkpoint.main([
                "--load", prot, "--opponent", f"ckpt:{rec}",
                "--opp-lookahead-depth", "1", "--games", "4",
                "--seed", "3"])
        assert "over 4 games" in buf.getvalue(), prot


def _explicit_lookahead3(s, k, step_fn):
    """Independent Python coding of the depth-3 beam contract: rank
    legal children by depth-1 value (stub value head), exact depth-2
    minimax backup under the top-k, argmax with first-occurrence
    tie-break in rank order."""
    def stub_v(st):
        obs = jnp.asarray(np.asarray(make_state(st), np.float32)[None])
        return float(_stub_apply(None, obs)[1][0])

    def rootp(st, v):
        return v if int(st.turn) == int(s.turn) else -v

    legal = np.flatnonzero(np.asarray(s.legal))
    d1, info = {}, {}
    for a in legal:
        res = step_fn(s, jnp.int32(a))
        c = res.state
        rc = float(res.reward)
        d1[a] = rc if bool(c.terminated) else rootp(c, stub_v(c))
        info[a] = (c, rc)
    ranked = sorted(legal, key=lambda a: (-d1[a], a))[:k]
    best_val, best_a = -np.inf, None
    for a in ranked:
        c, rc = info[a]
        if bool(c.terminated):
            val = rc
        else:
            gc_vals = []
            for b in np.flatnonzero(np.asarray(c.legal)):
                res2 = step_fn(c, jnp.int32(b))
                g = res2.state
                r2 = rootp(c, float(res2.reward))
                if bool(g.terminated):
                    gc_vals.append(r2)
                    continue
                ggc_vals = []
                for d in np.flatnonzero(np.asarray(g.legal)):
                    res3 = step_fn(g, jnp.int32(d))
                    gg = res3.state
                    if bool(gg.terminated):
                        ggc_vals.append(rootp(g, float(res3.reward)))
                    else:
                        ggc_vals.append(rootp(gg, stub_v(gg)))
                gc_vals.append(max(ggc_vals)
                               if int(g.turn) == int(s.turn)
                               else min(ggc_vals))
            val = (max(gc_vals) if int(c.turn) == int(s.turn)
                   else min(gc_vals))
        if val > best_val:
            best_val, best_a = val, int(a)
    return best_a


@pytest.mark.slow
def test_net_lookahead_depth3_beam_matches_explicit():
    """Depth-3 beam lookahead == the independent explicit expansion, at
    a narrow beam AND at beam_k = 64 (exact depth 3)."""
    from gymothelloenv_tpu.train.ppo_trainer import net_lookahead_policy

    step_fn = jax.jit(lambda s, a: core.step(s, a, RCFG))
    key = jax.random.PRNGKey(11)
    for k in (3, 64):
        act = jax.jit(net_lookahead_policy(None, _stub_apply, RCFG,
                                           depth=3, beam_k=k))
        s = core.reset(RCFG)
        # Skip into the midgame where passes/terminals appear.
        for _ in range(30):
            legal = np.flatnonzero(np.asarray(s.legal))
            key, kk = jax.random.split(key)
            a = int(legal[jax.random.randint(kk, (), 0, len(legal))])
            s = step_fn(s, jnp.int32(a)).state
            if bool(s.terminated):
                s = core.reset(RCFG)
        checked = 0
        while checked < 6 and not bool(s.terminated):
            got = int(act(key, s))
            want = _explicit_lookahead3(s, k, step_fn)
            assert got == want, (k, checked, got, want)
            checked += 1
            legal = np.flatnonzero(np.asarray(s.legal))
            key, kk = jax.random.split(key)
            a = int(legal[jax.random.randint(kk, (), 0, len(legal))])
            s = step_fn(s, jnp.int32(a)).state
        assert checked >= 4, (k, checked)
