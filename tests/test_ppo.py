import pytest
"""PPO agent tests: GAE vs the reference recurrence, masked-update learning,
self-play rollout invariants, trainer smoke + checkpoint roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.agents.ppo import (PPOConfig, Transition,
                                          compute_gae, make_optimizer,
                                          ppo_update)
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.models.nets import PolicyNet
from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                 SelfPlayConfig,
                                                 make_apply_fn,
                                                 make_network)
from gymothelloenv_tpu.train.self_play import collect_rollout, selfplay_init


def _dummy_rollout(T, N, key):
    ks = jax.random.split(key, 4)
    return Transition(
        obs=jnp.zeros((T, N, 4, 4, 4)),
        action=jnp.zeros((T, N), jnp.int32),
        logp=jnp.zeros((T, N)),
        value=jax.random.normal(ks[0], (T, N)),
        reward=jax.random.normal(ks[1], (T, N)),
        done=jax.random.bernoulli(ks[2], 0.1, (T, N)),
        legal=jnp.ones((T, N, 16), bool),
    )


def test_gae_matches_reference_recurrence():
    """storage.py:99-112 (use_gae, no proper-time-limits) as a Python loop."""
    cfg = PPOConfig(gamma=0.97, gae_lambda=0.9)
    T, N = 12, 5
    roll = _dummy_rollout(T, N, jax.random.PRNGKey(0))
    bootstrap = jax.random.normal(jax.random.PRNGKey(9), (N,))

    adv, ret = compute_gae(roll, bootstrap, cfg)

    value = np.asarray(roll.value)
    reward = np.asarray(roll.reward)
    masks = 1.0 - np.asarray(roll.done).astype(np.float64)  # mask_{t+1}
    next_value = np.concatenate([value[1:], np.asarray(bootstrap)[None]], 0)
    gae = np.zeros(N)
    want_ret = np.zeros((T, N))
    for t in reversed(range(T)):
        delta = reward[t] + cfg.gamma * next_value[t] * masks[t] - value[t]
        gae = delta + cfg.gamma * cfg.gae_lambda * masks[t] * gae
        want_ret[t] = gae + value[t]
    np.testing.assert_allclose(np.asarray(ret), want_ret, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(adv), want_ret - value, rtol=1e-4,
                               atol=1e-5)


def test_ppo_update_increases_good_action_probability():
    """Fabricated rollout: action 5 always gets reward 1, others 0.  After a
    few updates the policy must prefer action 5."""
    env_cfg = EnvConfig(board_size=4)
    net = PolicyNet(num_actions=16)
    apply_fn = make_apply_fn(net)
    key = jax.random.PRNGKey(0)
    obs = jax.random.normal(key, (8, 16, 4, 4, 4)) * 0.1
    params = net.init(key, obs[0])
    cfg = PPOConfig(lr=3e-3, num_updates=50, entropy_coef=0.0,
                    use_linear_lr_decay=False, ppo_epochs=2,
                    num_mini_batch=2)
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)

    legal = jnp.ones((8, 16, 16), bool)

    def prob_of_5(params):
        logits, _, _ = apply_fn(params, obs.reshape(-1, 4, 4, 4))
        return float(jax.nn.softmax(logits, -1)[:, 5].mean())

    p0 = prob_of_5(params)
    upd = jax.jit(lambda p, o, r, k: ppo_update(
        p, o, r, jnp.zeros(16), k, apply_fn, optimizer, cfg))
    for i in range(30):
        key, k_act, k_upd = jax.random.split(key, 3)
        action = jax.random.randint(k_act, (8, 16), 0, 16)
        logits, values, _ = apply_fn(params, obs.reshape(-1, 4, 4, 4))
        logp_all = jax.nn.log_softmax(logits, -1).reshape(8, 16, 16)
        roll = Transition(
            obs=obs, action=action,
            logp=jnp.take_along_axis(logp_all, action[..., None],
                                     -1)[..., 0],
            value=values.reshape(8, 16),
            reward=(action == 5).astype(jnp.float32),
            done=jnp.ones((8, 16), bool),
            legal=legal)
        params, opt_state, _ = upd(params, opt_state, roll, k_upd)
    p1 = prob_of_5(params)
    # Clipping (0.1) bounds per-round movement; 30 rounds must still raise
    # the good action's probability well above uniform 1/16.
    assert p1 > p0 + 0.04, (p0, p1)


def test_selfplay_rollout_invariants():
    env_cfg = EnvConfig(num_disk_as_reward=True)
    net = make_network(env_cfg)
    apply_fn = make_apply_fn(net)
    key = jax.random.PRNGKey(0)
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    sp = selfplay_init(params, apply_fn, key, env_cfg, num_envs=16)
    sp, roll, bootstrap = jax.jit(
        collect_rollout, static_argnames=("apply_fn", "cfg", "num_steps",
                                          "init_rand_steps"))(
        params, apply_fn=apply_fn, sp=sp, cfg=env_cfg, num_steps=40)

    obs = np.asarray(roll.obs)          # (T, N, 4, 8, 8)
    action = np.asarray(roll.action)
    legal = np.asarray(roll.legal)
    reward = np.asarray(roll.reward)
    done = np.asarray(roll.done)

    T, N = action.shape
    # Every recorded action was legal at its decision point.
    assert legal[np.arange(T)[:, None], np.arange(N)[None, :],
                 action].all()
    # Rewards only on episode-ending transitions, and they are disk diffs.
    assert (reward[~done] == 0).all()
    assert done.sum() > 0
    ended = reward[done]
    assert np.abs(ended).max() <= 64 and (ended == ended.astype(int)).all()
    # Disk-diff outcomes of full games are even (64 disks split W/B) unless
    # a wipeout bonus fired.
    # The turn plane of every decision obs equals the protagonist's color
    # seen by that game at that time (turn == pcolor at decision points).
    turn_plane = obs[:, :, 2, 0, 0]
    assert set(np.unique(turn_plane).tolist()) <= {0.0, 1.0}
    assert bootstrap.shape == (N,)


def test_trainer_smoke_and_checkpoint(tmp_path):
    tr = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=4),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=8, test_interval=1000))
    tr.train(num_updates=2, log_every=100)
    path = os.path.join(tmp_path, "ck.msgpack")
    tr.save(path)

    tr2 = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=4),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=8, test_interval=1000))
    tr2.load(path)
    assert tr2.update_count == tr.update_count
    p1 = jax.tree.leaves(tr.params)
    p2 = jax.tree.leaves(tr2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_checkpoint_step_placeholder(tmp_path):
    """A ``{step}`` placeholder in the checkpoint path keeps one file per
    interval save instead of overwriting (post-hoc early stopping)."""
    tr = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=4),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=8, save_interval=2,
                               test_interval=1000),
        log_fn=lambda step, m: None)
    tr.train(num_updates=4, log_every=100,
             checkpoint_path=str(tmp_path / "ck_{step}.msgpack"))
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["ck_2.msgpack", "ck_4.msgpack"]
    tr2 = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=4),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=8))
    tr2.load(str(tmp_path / "ck_2.msgpack"))
    assert tr2.update_count == 2


def _make_recurrent_setup(key, T=6, N=8, A=10, D=12, H=16):
    """Tiny recurrent actor-critic + a synthetic rollout whose behaviour
    logp/value were produced by the SAME GRU replay the update performs."""
    from flax import linen as nn
    from gymothelloenv_tpu.models.nets import GRUCore
    from gymothelloenv_tpu.models.distributions import MaskedCategorical

    class TinyRecurrent(nn.Module):
        @nn.compact
        def __call__(self, x, h, mask):
            x = nn.tanh(nn.Dense(H)(x.reshape(x.shape[0], -1)))
            x, h = GRUCore(hidden_size=H)(x, h, mask)
            logits = nn.Dense(A)(x)
            value = nn.Dense(1)(x)[..., 0]
            return logits, value, h

    net = TinyRecurrent()
    ks = jax.random.split(key, 6)
    params = net.init(ks[0], jnp.zeros((N, D)), jnp.zeros((N, H)),
                      jnp.ones((N,)))

    def apply_fn(p, obs_t, h, mask_t):
        return net.apply(p, obs_t, h, mask_t)

    obs = jax.random.normal(ks[1], (T, N, D))
    legal = jnp.ones((T, N, A), bool).at[:, :, -1].set(False)
    done = jax.random.bernoulli(ks[2], 0.25, (T, N))
    masks = jnp.concatenate(
        [jnp.ones((1, N)), 1.0 - done[:-1].astype(jnp.float32)])
    h0 = jnp.zeros((N, H))

    def collect_step(h, inp):
        obs_t, mask_t, k = inp
        logits, value, h = apply_fn(params, obs_t, h, mask_t)
        a = MaskedCategorical(logits=logits, mask=legal[0]).sample(k)
        logp = MaskedCategorical(logits=logits,
                                 mask=legal[0]).log_prob(a)
        return h, (a, logp, value)

    _, (action, logp, value) = jax.lax.scan(
        collect_step, h0, (obs, masks, jax.random.split(ks[3], T)))
    rollout = Transition(
        obs=obs, action=action, logp=logp, value=value,
        reward=jax.random.normal(ks[4], (T, N)) * 0.1,
        done=done, legal=legal)
    boot = jax.random.normal(ks[5], (N,)) * 0.1
    return apply_fn, params, rollout, h0, masks, boot


def test_ppo_update_recurrent_behaviour_replay_is_exact():
    """With zero learning rate the GRU replay must regenerate the
    behaviour policy exactly through episode-boundary resets: every ratio
    is 1, so action_loss == -mean(normalized adv) == 0."""
    import optax
    from gymothelloenv_tpu.agents.ppo import ppo_update_recurrent

    apply_fn, params, rollout, h0, masks, boot = _make_recurrent_setup(
        jax.random.PRNGKey(0))
    cfg = PPOConfig(num_mini_batch=2, ppo_epochs=2,
                    use_linear_lr_decay=False)
    optimizer = optax.sgd(0.0)
    opt_state = optimizer.init(params)
    new_params, _, metrics = jax.jit(
        lambda p, o, k: ppo_update_recurrent(
            p, o, rollout, h0, masks, boot, k, apply_fn, optimizer,
            cfg))(params, opt_state, jax.random.PRNGKey(1))
    assert abs(float(metrics["action_loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(new_params),
                    jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ppo_update_recurrent_learns():
    """Real optimizer: params move, metrics finite, and repeated updates
    on the same data shrink the value loss."""
    import optax
    from gymothelloenv_tpu.agents.ppo import ppo_update_recurrent

    apply_fn, params, rollout, h0, masks, boot = _make_recurrent_setup(
        jax.random.PRNGKey(7))
    cfg = PPOConfig(num_mini_batch=2, ppo_epochs=2, lr=1e-2,
                    use_linear_lr_decay=False)
    optimizer = optax.adam(cfg.lr)
    opt_state = optimizer.init(params)
    losses = []
    step = jax.jit(lambda p, o, k: ppo_update_recurrent(
        p, o, rollout, h0, masks, boot, k, apply_fn, optimizer, cfg))
    for i in range(4):
        params, opt_state, metrics = step(params, opt_state,
                                          jax.random.PRNGKey(10 + i))
        losses.append(float(metrics["value_loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]


def test_flatten_optimizer_matches_unflattened():
    """PPOConfig.flatten_optimizer runs Adam on raveled updates — same
    math (elementwise Adam, global-norm clip), different state layout.
    Updated params must agree to float noise."""
    key = jax.random.PRNGKey(3)
    T, N = 6, 8
    net = PolicyNet(num_actions=64)
    params = net.init(key, jnp.zeros((1, 4, 8, 8)))
    ks = jax.random.split(key, 6)
    roll = Transition(
        obs=jax.random.bernoulli(ks[0], 0.3, (T, N, 4, 8, 8)).astype(
            jnp.int8),
        action=jax.random.randint(ks[1], (T, N), 0, 64),
        logp=-jnp.abs(jax.random.normal(ks[2], (T, N))),
        value=jax.random.normal(ks[3], (T, N)) * 0.1,
        reward=jax.random.normal(ks[4], (T, N)) * 0.1,
        done=jax.random.bernoulli(ks[5], 0.1, (T, N)),
        legal=jnp.ones((T, N, 64), bool))
    apply_fn = lambda p, o: net.apply(p, o)  # noqa: E731

    outs = []
    for flat in (False, True):
        cfg = PPOConfig(num_updates=2, flatten_optimizer=flat)
        opt = make_optimizer(cfg)
        p2, _, _ = jax.jit(
            lambda p, o, r, k, opt=opt, cfg=cfg: ppo_update(
                p, o, r, jnp.zeros((N,)), k, apply_fn, opt, cfg))(
            params, opt.init(params), roll, jax.random.PRNGKey(11))
        outs.append(p2)
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_opponent_pool_training():
    """League-lite: the non-learning color plays a frozen pool snapshot.
    Pool fills at pool_interval, caps at opponent_pool, and training
    still learns/runs end-to-end."""
    trainer = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=8),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=8, seed=1,
                               opponent_pool=2, pool_interval=2,
                               test_interval=10_000,
                               save_interval=10_000),
        log_fn=lambda step, m: None)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), trainer.params)
    trainer.train(6, log_every=100)
    assert len(trainer.pool) == 2  # capped
    # Pool entries are distinct buffers from the live (donated) params.
    for snap in trainer.pool:
        assert all(np.isfinite(np.asarray(x)).all()
                   for x in jax.tree.leaves(snap))
    changed = any(
        not np.array_equal(np.asarray(a), b) for a, b in zip(
            jax.tree.leaves(trainer.params), jax.tree.leaves(p0)))
    assert changed
    # Mirror self-play (pool=0) still runs through the same trainer.
    t2 = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=2),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=8, seed=1,
                               test_interval=10_000,
                               save_interval=10_000),
        log_fn=lambda step, m: None)
    t2.train(2, log_every=100)


def test_eval_checkpoint_head_to_head(tmp_path):
    """eval_checkpoint --opponent ckpt:<path>: two saved checkpoints play
    each other; identical checkpoints split evenly."""
    import contextlib
    import io

    from gymothelloenv_tpu.cli.eval_checkpoint import main as eval_main

    trainer = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=1),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=4, width_mult=2,
                               hidden_size=256, test_interval=10_000,
                               save_interval=10_000),
        log_fn=lambda step, m: None)
    trainer.ensure_initialized()
    path = str(tmp_path / "a.msgpack")
    trainer.save(path)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        eval_main(["--load", path, "--opponent", f"ckpt:{path}",
                   "--games", "16"])
    out = buf.getvalue()
    assert "opponent checkpoint" in out and "width_mult=2" in out
    # Identical nets: outcome is a fair coin per game (distinct RNG
    # streams per side, so not exactly mirrored) — check the tally adds
    # up and neither side sweeps.
    import re
    m = re.search(r"(\d+) / (\d+) / (\d+) \(W/D/L", out)
    w, d, l = map(int, m.groups())
    assert w + d + l == 16
    assert 0 < w < 16 and 0 < l < 16


@pytest.mark.slow
def test_chain_updates_mode():
    """chain_updates scans K train steps per jitted dispatch; cadence
    (eval/save) quantizes to interval crossings."""
    import jax
    import numpy as np

    from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                     SelfPlayConfig)

    logged = []
    run_cfg = SelfPlayConfig(num_envs=8, num_steps=4, chain_updates=2,
                             num_test_games=4, test_interval=4,
                             hidden_size=64)
    tr = PPOSelfPlayTrainer(
        ppo_cfg=PPOConfig(ppo_epochs=2, num_mini_batch=2, num_updates=8),
        run_cfg=run_cfg, log_fn=lambda step, m: logged.append((step, m)))
    tr.train(8, log_every=1)
    assert tr.update_count == 8
    # interval-crossing eval fired at updates 4 and 8
    evals = [s for s, m in logged if any("win%" in k for k in m)]
    assert evals == [4, 8], evals
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(tr.params))

    # pool + chaining is rejected
    import pytest
    with pytest.raises(ValueError, match="chain_updates"):
        PPOSelfPlayTrainer(run_cfg=SelfPlayConfig(
            num_envs=8, chain_updates=2, opponent_pool=2))


def test_net_lookahead_policy_matches_explicit_expansion():
    """The 1-ply value-lookahead eval policy (round 3,
    eval_checkpoint --lookahead) picks argmax over legal children of
    [terminal reward | ±V(child)] — checked against an explicit python
    expansion with a stub value head (mover-perspective disk diff), on
    states drawn from a random game."""
    import numpy as np

    from gymothelloenv_tpu.core import state as core
    from gymothelloenv_tpu.core.featurize import make_state
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.ppo_trainer import net_lookahead_policy

    cfg = EnvConfig(num_disk_as_reward=True)

    def stub_apply(params, obs):
        # V = disk diff from the to-move player's perspective:
        # (black - white) * turn, turn from the constant plane 2.
        diff = obs[:, 0].sum((1, 2)) - obs[:, 1].sum((1, 2))
        turn = 2.0 * obs[:, 2, 0, 0] - 1.0
        return None, diff * turn, None

    act = jax.jit(net_lookahead_policy(None, stub_apply, cfg))

    key = jax.random.PRNGKey(3)
    s = core.reset(cfg)
    checked = 0
    for ply in range(60):
        if bool(s.terminated):
            break
        legal = np.flatnonzero(np.asarray(s.legal))
        # Explicit expansion.
        best_val, best_a = -1e18, None
        for a in legal:
            res = core.step(s, jnp.int32(a), cfg)
            child = res.state
            if bool(child.terminated):
                val = float(res.reward)
            else:
                obs = np.asarray(make_state(child), np.float32)[None]
                _, v, _ = stub_apply(None, jnp.asarray(obs))
                v = float(v[0])
                val = v if int(child.turn) == int(s.turn) else -v
            if val > best_val:
                best_val, best_a = val, int(a)
        got = int(act(key, s))
        assert got == best_a, (ply, got, best_a, legal)
        checked += 1
        # Advance with a random legal move (not the lookahead move, so
        # we visit diverse states).
        key, k = jax.random.split(key)
        a = int(legal[jax.random.randint(k, (), 0, len(legal))])
        s = core.step(s, jnp.int32(a), cfg).state
    assert checked >= 30


def test_pool_anchor_training(tmp_path):
    """--pool-anchor: an external checkpoint joins the opponent draw
    permanently (never evicted), alongside the snapshot ring; anchors
    with a mismatched architecture are rejected loudly."""
    from gymothelloenv_tpu.utils.checkpoint import save_checkpoint

    def run_cfg(**kw):
        kw.setdefault("seed", 1)
        return SelfPlayConfig(num_envs=8, num_steps=8,
                              test_interval=10_000, save_interval=10_000,
                              **kw)

    # Build an anchor checkpoint with the SAME architecture.
    donor = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=2), run_cfg=run_cfg(seed=9),
        log_fn=lambda step, m: None)
    anchor = tmp_path / "anchor.msgpack"
    save_checkpoint(str(anchor), 0, donor.params, donor.opt_state)

    trainer = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=6),
        run_cfg=run_cfg(opponent_pool=2, pool_interval=2,
                        pool_anchors=(str(anchor),)),
        log_fn=lambda step, m: None)
    assert len(trainer.anchors) == 1
    trainer.train(6, log_every=100)
    assert len(trainer.pool) == 2          # ring still caps
    assert len(trainer.anchors) == 1       # anchors never evicted
    a0 = jax.tree.leaves(trainer.anchors[0])
    d0 = jax.tree.leaves(donor.params)
    for a, b in zip(a0, d0):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Anchors without a pool are rejected.
    with pytest.raises(ValueError, match="opponent_pool"):
        PPOSelfPlayTrainer(
            env_cfg=EnvConfig(num_disk_as_reward=True),
            ppo_cfg=PPOConfig(), log_fn=lambda step, m: None,
            run_cfg=run_cfg(pool_anchors=(str(anchor),)))

    # Architecture-mismatched anchors are rejected loudly.
    wide = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=2),
        run_cfg=run_cfg(seed=3, width_mult=2, hidden_size=64),
        log_fn=lambda step, m: None)
    bad = tmp_path / "bad.msgpack"
    save_checkpoint(str(bad), 0, wide.params, wide.opt_state)
    with pytest.raises(ValueError, match="architecture"):
        PPOSelfPlayTrainer(
            env_cfg=EnvConfig(num_disk_as_reward=True),
            ppo_cfg=PPOConfig(), log_fn=lambda step, m: None,
            run_cfg=run_cfg(opponent_pool=2,
                            pool_anchors=(str(bad),)))
