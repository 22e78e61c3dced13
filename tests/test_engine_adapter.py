import pytest
"""The bit-engine collector path must be transition-for-transition identical
to the plane path: both engines implement the same reference semantics
(othello.py:217-501), and with ``init_rand_steps=0`` the collectors consume
RNG in the same order, so every emitted rollout leaf must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import bitboard as bb
from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.engine import BitEngine, PlaneEngine, get_engine
from gymothelloenv_tpu.core.featurize import make_state
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.train.self_play import collect_rollout, selfplay_init


def _linear_apply_fn(key, num_actions=64, planes=4, size=8):
    """Deterministic stand-in policy: logits/value are fixed linear maps of
    the featurized observation (no flax init, cheap to trace)."""
    k1, k2 = jax.random.split(key)
    W = jax.random.normal(k1, (planes * size * size, num_actions)) * 0.3
    v = jax.random.normal(k2, (planes * size * size,)) * 0.1

    def apply_fn(params, obs):
        flat = obs.reshape(obs.shape[0], -1)
        return flat @ W, flat @ v, None
    return apply_fn


def _random_states(key, n, plies):
    """Batch of positions reached by ``plies`` random legal moves."""
    cfg = EnvConfig()

    @jax.jit
    def play(env, key):
        def ply(env, k):
            bits = bb.from_planes(env.board, env.turn, env.legal,
                                  env.terminated, env.winner)
            actions = bb.random_legal_bit(k, bits.legal)
            new = jax.vmap(lambda s, a: core.step(s, a, cfg).state)(
                env, actions)
            env = jax.tree.map(
                lambda nw, od: jnp.where(
                    env.terminated.reshape((-1,) + (1,) * (nw.ndim - 1)),
                    od, nw), new, env)
            return env, None

        env, _ = jax.lax.scan(ply, env, jax.random.split(key, plies))
        return env

    env = jax.vmap(lambda _: core.reset(cfg))(jnp.arange(n))
    return play(env, key)


def test_engine_selection():
    assert isinstance(get_engine(EnvConfig(board_size=8)), BitEngine)
    assert isinstance(get_engine(EnvConfig(board_size=8), force_plane=True),
                      PlaneEngine)
    assert isinstance(get_engine(EnvConfig(board_size=6)), PlaneEngine)


def test_bit_featurize_matches_plane():
    env = _random_states(jax.random.PRNGKey(3), 32, 24)
    plane_obs = jax.vmap(make_state)(env)
    bits = bb.from_planes(env.board, env.turn, env.legal,
                          env.terminated, env.winner)
    bit_obs = BitEngine().featurize(bits)
    np.testing.assert_array_equal(np.asarray(plane_obs),
                                  np.asarray(bit_obs))


def test_bit_outcome_matches_plane():
    cfgs = (EnvConfig(), EnvConfig(num_disk_as_reward=True))
    env = _random_states(jax.random.PRNGKey(5), 32, 70)
    bits = bb.from_planes(env.board, env.turn, env.legal,
                          env.terminated, env.winner)
    for cfg in cfgs:
        for color in (-1, 1):
            pcolor = jnp.full((32,), color, jnp.int8)
            want = PlaneEngine().outcome_for(env, pcolor, cfg)
            got = BitEngine().outcome_for(bits, pcolor, cfg)
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


@pytest.mark.slow
def test_collect_rollout_bit_matches_plane_exactly():
    cfg = EnvConfig(num_disk_as_reward=True)
    apply_fn = _linear_apply_fn(jax.random.PRNGKey(11))
    key = jax.random.PRNGKey(0)
    rollouts = {}
    for force_plane in (False, True):
        sp = selfplay_init(None, apply_fn, key, cfg, num_envs=8,
                           force_plane=force_plane)
        sp, rollout, boot = jax.jit(
            collect_rollout,
            static_argnames=("apply_fn", "cfg", "num_steps",
                             "init_rand_steps", "logp_mode",
                             "force_plane"))(
            None, apply_fn=apply_fn, sp=sp, cfg=cfg, num_steps=40,
            force_plane=force_plane)
        rollouts[force_plane] = (jax.tree.map(np.asarray, rollout),
                                 np.asarray(boot))
    bit, plane = rollouts[False], rollouts[True]
    for name in ("obs", "action", "logp", "value", "reward", "done",
                 "legal"):
        np.testing.assert_array_equal(
            getattr(bit[0], name), getattr(plane[0], name), err_msg=name)
    np.testing.assert_array_equal(bit[1], plane[1])
    # sanity: the rollout actually contains finished games
    assert bit[0].done.sum() > 0
