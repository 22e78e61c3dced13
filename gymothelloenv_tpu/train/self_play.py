"""On-device PPO self-play — the TPU-native rebuild of the flagship trainer
(``ppo_run_self_play.py`` + ``envs.py`` + 8 worker processes).

Data semantics match the reference's pipe protocol (SURVEY.md §3.4,
ppo_run_self_play.py:244-368): every game draws a random "protagonist
color"; BOTH colors are played by the same policy (masked sampling), but
only the protagonist color's decisions become learner transitions; the final
protagonist transition carries the terminal outcome from the protagonist's
perspective.  The pipe machinery collapses into a *slot* scan:

  one slot = advance opponent plies -> emit the pending protagonist
  transition (crediting the terminal reward if the episode ended) ->
  reset finished games (new random protagonist color) -> protagonist acts,
  becoming the new pending transition.

Unlike the reference master loop we never insert zero-observation 'over'
filler transitions for desynchronized envs (envs.py:221-225) — games reset
within the slot, so every rollout slot is a real transition.  (Documented
divergence; strictly denser data.)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.featurize import make_state
from gymothelloenv_tpu.core.state import EnvConfig, OthelloState
from gymothelloenv_tpu.agents.ppo import Transition
from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.policies.scripted import random_action
from gymothelloenv_tpu.train.tournament import draw_max_rand_steps

# apply_fn(params, obs) -> (logits, value, aux)
ApplyFn = Callable[..., tuple]


@struct.dataclass
class Pending:
    obs: jnp.ndarray      # (N, C, B, B)
    action: jnp.ndarray   # (N,)
    logp: jnp.ndarray     # (N,)
    value: jnp.ndarray    # (N,)
    legal: jnp.ndarray    # (N, A)


@struct.dataclass
class SelfPlayState:
    env: OthelloState     # batched (N, ...), NOT auto-reset
    rand_left: jnp.ndarray
    pcolor: jnp.ndarray   # int8 (N,) protagonist color per game
    env_keys: jnp.ndarray  # per-game keys (N, 2)
    pending: Pending
    key: jax.Array


def _split_each(keys):
    """Advance a batch of per-game keys; returns (new_keys, subkeys)."""
    both = jax.vmap(lambda k: jax.random.split(k))(keys)
    return both[:, 0], both[:, 1]


def _featurize_batch(env: OthelloState) -> jnp.ndarray:
    return jax.vmap(make_state)(env)


def _policy_sample(params, apply_fn: ApplyFn, env: OthelloState,
                   keys: jnp.ndarray, logp_mode: str = "masked"):
    """Sample masked actions; ``logp_mode`` picks which behaviour log-prob
    is recorded: 'masked' (vendored Policy.act, model.py:60-90) or 'full'
    (the simple PPO stores full-softmax log-probs, ppo.py:309-310)."""
    obs = _featurize_batch(env)
    logits, value, _ = apply_fn(params, obs)
    dist = MaskedCategorical(logits=logits, mask=env.legal)
    action = jax.vmap(lambda d_logits, d_mask, k: MaskedCategorical(
        logits=d_logits, mask=d_mask).sample(k))(logits, env.legal, keys)
    if logp_mode == "full":
        logp_all = jax.nn.log_softmax(logits, axis=-1)
        logp = jnp.take_along_axis(logp_all, action[:, None], -1)[:, 0]
    else:
        logp = dist.log_prob(action)
    return obs, action, logp, value


def _masked_step(env: OthelloState, rand_left, keys, actions, do,
                 cfg: EnvConfig):
    """Step games where ``do``; elsewhere unchanged.  Applies the
    random-opening override (othello.py:70-73) before stepping.
    Returns (env, rand_left, keys)."""
    keys, sub = _split_each(keys)

    def one(k_rand, state, rleft, action, do):
        use_rand = (rleft > 0) & do
        exec_action = jnp.where(use_rand, random_action(k_rand, state.legal),
                                action)
        res = core.step(state, exec_action, cfg)
        new_state = jax.tree.map(
            lambda n, o: jnp.where(do, n, o), res.state, state)
        new_rleft = jnp.where(use_rand, rleft - 1, rleft)
        return new_state, new_rleft

    env, rand_left = jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
        sub, env, rand_left, actions, do)
    return env, rand_left, keys


def _advance_opponent(params, apply_fn, env, rand_left, keys, pcolor,
                      cfg: EnvConfig):
    """Step opponent-to-move games until every game is either terminated or
    at the protagonist's decision point (the worker's inner while loops,
    ppo_run_self_play.py:288-300, :326-343)."""
    def needs(env):
        return (~env.terminated) & (env.turn != pcolor)

    def cond(carry):
        env, _, _ = carry
        return needs(env).any()

    def body(carry):
        env, rand_left, keys = carry
        keys, sample_keys = _split_each(keys)
        _, action, _, _ = _policy_sample(params, apply_fn, env, sample_keys)
        env, rand_left, keys = _masked_step(env, rand_left, keys, action,
                                            needs(env), cfg)
        return env, rand_left, keys

    return jax.lax.while_loop(cond, body, (env, rand_left, keys))


def outcome_for(board: jnp.ndarray, pcolor: jnp.ndarray,
                cfg: EnvConfig) -> jnp.ndarray:
    """Terminal outcome from the protagonist's perspective, matching the
    mover-perspective rewards the worker forwards/negates
    (ppo_run_self_play.py:303-306, :346-348; othello.py:444-461).
    Sudden death cannot occur (policies only emit legal moves)."""
    mine = (board == pcolor[..., None, None].astype(board.dtype)).sum(
        axis=(-2, -1)).astype(jnp.float32)
    theirs = (board == (-pcolor)[..., None, None].astype(board.dtype)).sum(
        axis=(-2, -1)).astype(jnp.float32)
    if cfg.num_disk_as_reward:
        full = float(cfg.board_size ** 2)
        out = mine - theirs
        out = jnp.where(theirs == 0, full, out)
        out = jnp.where(mine == 0, -full, out)
        return out
    return jnp.sign(mine - theirs)


def _reset_done(env: OthelloState, rand_left, pcolor, keys, done,
                cfg: EnvConfig, init_rand_steps: int):
    keys, sub = _split_each(keys)

    def one(key, state, rleft, pc, done):
        k_rand, k_color = jax.random.split(key)
        fresh = core.reset(cfg)
        new_state = jax.tree.map(
            lambda f, o: jnp.where(done, f, o), fresh, state)
        new_rleft = jnp.where(
            done, draw_max_rand_steps(k_rand, init_rand_steps), rleft)
        # protagonist = ±1 with p=1/2 (ppo_run_self_play.py:265-266)
        new_color = jnp.where(
            done,
            (jax.random.randint(k_color, (), 0, 2) * 2 - 1).astype(jnp.int8),
            pc)
        return new_state, new_rleft, new_color

    env, rand_left, pcolor = jax.vmap(one)(sub, env, rand_left, pcolor, done)
    return env, rand_left, pcolor, keys


def _protagonist_act(params, apply_fn, env, rand_left, keys, cfg,
                     logp_mode: str = "masked"):
    """Phase C: sample the protagonist decision, step the env, return the
    new pending transition."""
    legal = env.legal
    keys, sample_keys = _split_each(keys)
    obs, action, logp, value = _policy_sample(params, apply_fn, env,
                                              sample_keys, logp_mode)
    num_envs = action.shape[0]
    env, rand_left, keys = _masked_step(
        env, rand_left, keys, action, jnp.ones((num_envs,), bool), cfg)
    pending = Pending(obs=obs, action=action, logp=logp, value=value,
                      legal=legal)
    return env, rand_left, keys, pending


def selfplay_init(params, apply_fn: ApplyFn, key: jax.Array,
                  cfg: EnvConfig, num_envs: int,
                  init_rand_steps: int = 0,
                  logp_mode: str = "masked") -> SelfPlayState:
    """Fresh games + first protagonist decision (the initial pending)."""
    key, k_env, k_color, k_rand = jax.random.split(key, 4)
    env_keys = jax.random.split(k_env, num_envs)
    env = jax.vmap(lambda _: core.reset(cfg))(jnp.arange(num_envs))
    rand_left = jax.vmap(draw_max_rand_steps, in_axes=(0, None))(
        jax.random.split(k_rand, num_envs), init_rand_steps)
    pcolor = (jax.random.randint(k_color, (num_envs,), 0, 2) * 2
              - 1).astype(jnp.int8)

    env, rand_left, env_keys = _advance_opponent(
        params, apply_fn, env, rand_left, env_keys, pcolor, cfg)
    env, rand_left, env_keys, pending = _protagonist_act(
        params, apply_fn, env, rand_left, env_keys, cfg, logp_mode)
    return SelfPlayState(env=env, rand_left=rand_left, pcolor=pcolor,
                         env_keys=env_keys, pending=pending, key=key)


def collect_rollout(params, apply_fn: ApplyFn, sp: SelfPlayState,
                    cfg: EnvConfig, num_steps: int,
                    init_rand_steps: int = 0,
                    logp_mode: str = "masked"):
    """Scan ``num_steps`` slots; returns (new_state, Transition (T, N, ...),
    bootstrap_value (N,)).

    The bootstrap value is the behaviour value of the state after the last
    emitted transition — exactly ``get_value(rollouts.obs[-1])``
    (ppo_run_self_play.py:199-203) without the extra forward pass.
    """
    def slot(sp: SelfPlayState, _):
        # Phase A: opponent plies until protagonist turn or termination.
        env, rand_left, env_keys = _advance_opponent(
            params, apply_fn, sp.env, sp.rand_left, sp.env_keys, sp.pcolor,
            cfg)

        # Emit the pending transition.
        done = env.terminated
        reward = jnp.where(done, outcome_for(env.board, sp.pcolor, cfg), 0.0)
        emit = Transition(obs=sp.pending.obs, action=sp.pending.action,
                          logp=sp.pending.logp, value=sp.pending.value,
                          reward=reward, done=done, legal=sp.pending.legal)

        # Phase B: reset finished games with fresh protagonist colors.
        env, rand_left, pcolor, env_keys = _reset_done(
            env, rand_left, sp.pcolor, env_keys, done, cfg, init_rand_steps)

        # Phase B2: fresh white-protagonist games need black's reply first.
        env, rand_left, env_keys = _advance_opponent(
            params, apply_fn, env, rand_left, env_keys, pcolor, cfg)

        # Phase C: protagonist decision becomes the new pending.
        env, rand_left, env_keys, pending = _protagonist_act(
            params, apply_fn, env, rand_left, env_keys, cfg, logp_mode)

        return SelfPlayState(env=env, rand_left=rand_left, pcolor=pcolor,
                             env_keys=env_keys, pending=pending,
                             key=sp.key), emit

    sp, rollout = jax.lax.scan(slot, sp, None, length=num_steps)
    return sp, rollout, sp.pending.value
