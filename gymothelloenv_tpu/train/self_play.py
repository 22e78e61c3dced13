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

Representation: all env interaction goes through ``core.engine`` — for 8x8
the game batch stays packed as uint32 bitboard word pairs across the whole
scan (no plane pack/unpack per ply); planes materialize only as the network
input.  Other board sizes use the plane engine.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from gymothelloenv_tpu.core.engine import get_engine, outcome_for_board
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.agents.ppo import Transition
from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.train.tournament import draw_max_rand_steps

# apply_fn(params, obs) -> (logits, value, aux)
ApplyFn = Callable[..., tuple]

# Back-compat alias: dqn_trainer/teacher_student import this from here.
outcome_for = outcome_for_board


@struct.dataclass
class Pending:
    obs: jnp.ndarray      # (N, C, B, B) int8 — planes are {0,1}; stored
    #                       narrow so the update's minibatch gathers move
    #                       4x fewer bytes (ppo_loss casts to float)
    action: jnp.ndarray   # (N,)
    logp: jnp.ndarray     # (N,)
    value: jnp.ndarray    # (N,)
    legal: jnp.ndarray    # (N, A)


@struct.dataclass
class SelfPlayState:
    env: object           # engine state pytree, batched (N, ...); NOT
    #                       auto-reset (BitState for 8x8, OthelloState else)
    rand_left: jnp.ndarray
    pcolor: jnp.ndarray   # int8 (N,) protagonist color per game
    env_keys: jnp.ndarray  # per-game keys (N, 2)
    pending: Pending
    key: jax.Array


def split_each(keys):
    """Advance a batch of per-game keys; returns (new_keys, subkeys)."""
    both = jax.vmap(lambda k: jax.random.split(k))(keys)
    return both[:, 0], both[:, 1]


# Compacted lookahead width: the maximum number of simultaneously-legal
# moves in any reachable Othello position is 33 (proven by exhaustive
# search in the Othello programming literature; random-play positions
# peak around 20), so K = 34 slots cover every legal child with a static
# shape.  tests/test_lookahead_train.py empirically rechecks the bound
# over a large random-position sweep.
LOOKAHEAD_K = 34


def lookahead_action_values(params, apply_fn: ApplyFn, eng, env,
                            cfg: EnvConfig) -> jnp.ndarray:
    """(N, A) root-mover-perspective child values for every LEGAL
    candidate action: expand each action with the exact engine, score
    non-terminal children with the trained value head (negated when the
    turn passes), terminal children with their true mover-perspective
    reward — the in-collector (engine-layout) counterpart of
    ``ppo_trainer.net_lookahead_policy``.

    Round-5 perf (VERDICT r4 item 5): only legal children are expanded
    and evaluated.  Each row's legal actions are compacted into
    ``LOOKAHEAD_K`` static slots with a cumsum ranking (no sort — sorts
    trace expensive on TPU, see ops/shuffle.py), the net forward runs
    over ``K x N`` instead of ``A x N`` children (64 -> 34, and the
    average position has ~10 legal moves whose values are the only ones
    consumed), and the values scatter back to ``(N, A)``.  Values at ILLEGAL
    positions are unspecified (a large negative, or action 0's value in
    the padding slots) instead of the old sudden-death evaluation —
    callers must mask with the root legal mask (they always did; the
    masked result is bit-identical to the full expansion,
    tests/test_lookahead_train.py)."""
    A = cfg.num_actions
    N = env.turn.shape[0]
    K = min(LOOKAHEAD_K, A)
    NEG = -jnp.float32(1e9)
    legal = eng.legal_flat(env)                       # (N, A) bool
    actions = jnp.arange(A, dtype=jnp.int32)
    # Rank each row's legal actions 0..n_legal-1; illegal actions rank
    # K (excluded from the one-hot below).  The compaction and the
    # scatter-back both go through this (N, A, K) one-hot CONTRACTION
    # rather than scatters: the round-5 chip trace showed the two
    # scatters costing 77 + 41 ms/rollout (fusion.783/794, the order
    # scatter K-independent at N*A source elements), while the one-hot
    # product+reduce fuses on the VPU (data/logs/queue/
    # 50_trace_lookahead_collect.log).
    pos = jnp.cumsum(legal, axis=1, dtype=jnp.int32) - 1
    slot = jnp.where(legal, pos, K)
    slot_oh = slot[:, :, None] == jnp.arange(K, dtype=jnp.int32)
    order = (slot_oh * actions[None, :, None]).sum(
        axis=1, dtype=jnp.int32)                      # (N, K)
    # Unfilled slots (rows with < K legal moves) hold action 0: a
    # duplicate evaluation whose value the contraction never reads
    # (each legal (row, action) has exactly one slot).

    def child(k):
        return eng.step_all(env, order[:, k], cfg)

    children, rewards = jax.vmap(child)(jnp.arange(K, dtype=jnp.int32))
    flat = jax.tree.map(lambda x: x.reshape((K * N,) + x.shape[2:]),
                        children)
    obs = eng.featurize(flat)
    _, v, _ = apply_fn(params, obs)
    v = v.reshape(K, N)
    mover_v = jnp.where(flat.turn.reshape(K, N) == env.turn[None, :],
                        v, -v)
    vals_k = jnp.where(flat.terminated.reshape(K, N), rewards, mover_v)
    contrib = (slot_oh.astype(vals_k.dtype)
               * vals_k.T[:, None, :]).sum(axis=2)    # (N, A)
    return jnp.where(legal, contrib, NEG)


def make_lookahead_override(cfg: EnvConfig, tau: float = 0.0):
    """Search-bootstrapped acting (round-4 probe): the EXECUTED (and
    stored) protagonist action comes from the 1-ply value-lookahead
    operator instead of the sampled logits, while the update still trains
    the raw net — turning the eval-time policy-improvement operator
    (RESULTS.md round-3 finale) into a training signal.  ``tau`` > 0
    samples a softmax over child values at that temperature (exploration
    on the lookahead-improved distribution; the value scale is the
    training disk-diff scale, ±64); ``tau`` = 0 plays the argmax.

    Returns ``override(params, apply_fn, eng, env, key, legal) ->
    actions`` for ``policy_sample(act_override=...)``."""
    def override(params, apply_fn, eng, env, key, legal):
        vals = lookahead_action_values(params, apply_fn, eng, env, cfg)
        masked = jnp.where(legal, vals, -jnp.float32(1e9))
        if tau > 0:
            return jax.random.categorical(
                key, masked / jnp.float32(tau), axis=-1).astype(jnp.int32)
        return jnp.argmax(masked, axis=-1).astype(jnp.int32)

    return override


def policy_sample(params, apply_fn: ApplyFn, eng, env, keys,
                   logp_mode: str = "masked", act_override=None):
    """Sample masked actions; ``logp_mode`` picks which behaviour log-prob
    is recorded: 'masked' (vendored Policy.act, model.py:60-90) or 'full'
    (the simple PPO stores full-softmax log-probs, ppo.py:309-310).

    Sampling is ONE batched categorical from a single key (``keys[0]`` —
    a fresh subkey each ply): per-row vmapped keys cost a separate tiny
    threefry stream per env, which traced as the single most expensive
    op of the whole collection scan (~5 of 14 device-ms at N=4096,
    scripts/trace_collect.py); one key drives independent gumbels for
    every row at a fraction of that."""
    obs = eng.featurize(env)
    legal = eng.legal_flat(env)
    logits, value, _ = apply_fn(params, obs)
    dist = MaskedCategorical(logits=logits, mask=legal)
    if act_override is not None:
        # Search-bootstrapped acting: the override picks the executed
        # action; the stored behaviour log-prob is the policy's log-prob
        # OF that action (the PPO ratio then starts at 1, and the distill
        # update's CE pushes the raw policy toward the search action).
        action = act_override(params, apply_fn, eng, env, keys[0], legal)
    else:
        action = dist.sample(keys[0])
    if logp_mode == "full":
        # One-hot select (exact), not take_along_axis — per-row gathers
        # carry a large fixed cost on TPU (see MaskedCategorical.log_prob).
        logp_all = jax.nn.log_softmax(logits, axis=-1)
        onehot = action[:, None] == jnp.arange(
            logits.shape[-1], dtype=jnp.int32)
        logp = jnp.where(onehot, logp_all, 0.0).sum(axis=-1)
    else:
        logp = dist.log_prob(action)
    return obs, legal, action, logp, value


def masked_step(eng, env, rand_left, keys, actions, do, cfg: EnvConfig,
                rand_openings: bool = True):
    """Step games where ``do``; elsewhere unchanged.  Applies the
    random-opening override (othello.py:70-73) before stepping.
    Returns (env, rand_left, keys).

    ``rand_openings=False`` (static) elides the override entirely — the
    caller guarantees ``rand_left`` is all zeros (init_rand_steps == 0,
    the training default), which removes a per-ply random-legal draw +
    per-env key split from the scan."""
    if not rand_openings:
        env = eng.step_where(env, actions, do, cfg)
        return env, rand_left, keys
    keys, sub = split_each(keys)
    use_rand = (rand_left > 0) & do
    rand_actions = eng.random_legal(sub, env)
    exec_actions = jnp.where(use_rand, rand_actions, actions)
    env = eng.step_where(env, exec_actions, do, cfg)
    rand_left = jnp.where(use_rand, rand_left - 1, rand_left)
    return env, rand_left, keys


def advance_opponent(params, apply_fn, eng, env, rand_left, keys, pcolor,
                      cfg: EnvConfig, rand_openings: bool = True):
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
        keys, sample_keys = split_each(keys)
        _, _, action, _, _ = policy_sample(params, apply_fn, eng, env,
                                            sample_keys)
        env, rand_left, keys = masked_step(eng, env, rand_left, keys,
                                            action, needs(env), cfg,
                                            rand_openings)
        return env, rand_left, keys

    return jax.lax.while_loop(cond, body, (env, rand_left, keys))


def reset_done(eng, env, rand_left, pcolor, keys, done, cfg: EnvConfig,
                init_rand_steps: int):
    keys, sub = split_each(keys)
    env = eng.reset_where(env, done, cfg)
    if init_rand_steps > 0:
        k_rand, k_color = split_each(sub)
        new_rleft = jax.vmap(draw_max_rand_steps, in_axes=(0, None))(
            k_rand, init_rand_steps)
        rand_left = jnp.where(done, new_rleft, rand_left)
    else:
        # No random openings: rand_left stays all-zero, no per-env draws.
        k_color = sub
    # protagonist = ±1 with p=1/2 (ppo_run_self_play.py:265-266); one
    # batched draw from a single key (see policy_sample on why).
    new_color = (jax.random.randint(k_color[0], done.shape, 0, 2) * 2
                 - 1).astype(jnp.int8)
    pcolor = jnp.where(done, new_color, pcolor)
    return env, rand_left, pcolor, keys


def protagonist_act(params, apply_fn, eng, env, rand_left, keys, cfg,
                     logp_mode: str = "masked",
                     rand_openings: bool = True, act_override=None):
    """Phase C: sample the protagonist decision, step the env, return the
    new pending transition."""
    keys, sample_keys = split_each(keys)
    obs, legal, action, logp, value = policy_sample(
        params, apply_fn, eng, env, sample_keys, logp_mode, act_override)
    num_envs = action.shape[0]
    env, rand_left, keys = masked_step(
        eng, env, rand_left, keys, action, jnp.ones((num_envs,), bool),
        cfg, rand_openings)
    pending = Pending(obs=obs.astype(jnp.int8), action=action, logp=logp,
                      value=value, legal=legal)
    return env, rand_left, keys, pending


def selfplay_init(params, apply_fn: ApplyFn, key: jax.Array,
                  cfg: EnvConfig, num_envs: int,
                  init_rand_steps: int = 0,
                  logp_mode: str = "masked",
                  force_plane: bool = False,
                  opp_params=None, act_override=None) -> SelfPlayState:
    """Fresh games + first protagonist decision (the initial pending).

    ``opp_params`` (optional) plays the NON-learning color — mirror
    self-play when None (the reference's single shared policy,
    run_self_play.py:95-103), a frozen snapshot when given (opponent-pool
    training; see PPOSelfPlayTrainer).  ``act_override`` (optional, see
    ``make_lookahead_override``) replaces the PROTAGONIST's sampled
    action; opponent plies keep sampling."""
    eng = get_engine(cfg, force_plane)
    if opp_params is None:
        opp_params = params
    rand_openings = init_rand_steps > 0
    key, k_env, k_color, k_rand = jax.random.split(key, 4)
    env_keys = jax.random.split(k_env, num_envs)
    env = eng.reset_batch(num_envs, cfg)
    if rand_openings:
        rand_left = jax.vmap(draw_max_rand_steps, in_axes=(0, None))(
            jax.random.split(k_rand, num_envs), init_rand_steps)
    else:
        rand_left = jnp.zeros((num_envs,), jnp.int32)
    pcolor = (jax.random.randint(k_color, (num_envs,), 0, 2) * 2
              - 1).astype(jnp.int8)

    env, rand_left, env_keys = advance_opponent(
        opp_params, apply_fn, eng, env, rand_left, env_keys, pcolor, cfg,
        rand_openings)
    env, rand_left, env_keys, pending = protagonist_act(
        params, apply_fn, eng, env, rand_left, env_keys, cfg, logp_mode,
        rand_openings, act_override)
    return SelfPlayState(env=env, rand_left=rand_left, pcolor=pcolor,
                         env_keys=env_keys, pending=pending, key=key)


def collect_rollout(params, apply_fn: ApplyFn, sp: SelfPlayState,
                    cfg: EnvConfig, num_steps: int,
                    init_rand_steps: int = 0,
                    logp_mode: str = "masked",
                    force_plane: bool = False,
                    opp_params=None, act_override=None):
    """Scan ``num_steps`` slots; returns (new_state, Transition (T, N, ...),
    bootstrap_value (N,)).

    The bootstrap value is the behaviour value of the state after the last
    emitted transition — exactly ``get_value(rollouts.obs[-1])``
    (ppo_run_self_play.py:199-203) without the extra forward pass.

    ``force_plane`` must match the ``selfplay_init`` that built ``sp``.
    ``opp_params`` (optional) plays the non-learning color (opponent-pool
    training); None = mirror self-play (reference semantics).
    """
    eng = get_engine(cfg, force_plane)
    if opp_params is None:
        opp_params = params
    # Static: when training runs without random openings (the default),
    # the whole rand_left machinery drops out of the compiled scan.
    rand_openings = init_rand_steps > 0

    def slot(sp: SelfPlayState, _):
        # Phase A: opponent plies until protagonist turn or termination.
        env, rand_left, env_keys = advance_opponent(
            opp_params, apply_fn, eng, sp.env, sp.rand_left, sp.env_keys,
            sp.pcolor, cfg, rand_openings)

        # Emit the pending transition.
        done = env.terminated
        reward = jnp.where(done, eng.outcome_for(env, sp.pcolor, cfg), 0.0)
        emit = Transition(obs=sp.pending.obs, action=sp.pending.action,
                          logp=sp.pending.logp, value=sp.pending.value,
                          reward=reward, done=done, legal=sp.pending.legal)

        # Phase B: reset finished games with fresh protagonist colors.
        env, rand_left, pcolor, env_keys = reset_done(
            eng, env, rand_left, sp.pcolor, env_keys, done, cfg,
            init_rand_steps)

        # Phase B2: fresh white-protagonist games need black's reply first.
        env, rand_left, env_keys = advance_opponent(
            opp_params, apply_fn, eng, env, rand_left, env_keys, pcolor,
            cfg, rand_openings)

        # Phase C: protagonist decision becomes the new pending.
        env, rand_left, env_keys, pending = protagonist_act(
            params, apply_fn, eng, env, rand_left, env_keys, cfg,
            logp_mode, rand_openings, act_override)

        return SelfPlayState(env=env, rand_left=rand_left, pcolor=pcolor,
                             env_keys=env_keys, pending=pending,
                             key=sp.key), emit

    sp, rollout = jax.lax.scan(slot, sp, None, length=num_steps)
    return sp, rollout, sp.pending.value


def collect_rollout_time_limited(params, apply_fn: ApplyFn,
                                 sp: SelfPlayState, elapsed: jnp.ndarray,
                                 cfg: EnvConfig, num_steps: int,
                                 max_episode_plies: int,
                                 init_rand_steps: int = 0,
                                 logp_mode: str = "masked",
                                 force_plane: bool = False,
                                 opp_params=None):
    """``collect_rollout`` with an episode step cap — the consumer of
    gym's TimeLimit + the fork's TimeLimitMask semantics
    (``envs.vec_wrappers.time_limit_step``, vendored envs.py:110-119):
    an episode whose protagonist has taken ``max_episode_plies``
    decisions is truncated (done without an outcome, reward 0) and the
    truncation is flagged so ``compute_gae_time_limits``
    (storage.py:79-96, ``use_proper_time_limits=True``) zeroes its
    advantage instead of bootstrapping a fictitious terminal.

    ``elapsed`` (N,) int32 counts the current episode's emitted
    protagonist decisions INCLUDING the pending one (fresh state from
    ``selfplay_init`` => ones).  Returns (sp, elapsed, rollout,
    bad_transition (T, N) bool, bootstrap_value).  Kept separate from
    ``collect_rollout`` — that one is the perf-critical bench path; the
    phase helpers are shared so the game semantics cannot drift."""
    eng = get_engine(cfg, force_plane)
    if opp_params is None:
        opp_params = params
    rand_openings = init_rand_steps > 0

    def slot(carry, _):
        sp, elapsed = carry
        env, rand_left, env_keys = advance_opponent(
            opp_params, apply_fn, eng, sp.env, sp.rand_left, sp.env_keys,
            sp.pcolor, cfg, rand_openings)

        # Truncation is flagged even when the task also ended this step
        # (TimeLimitMask: _max_episode_steps == _elapsed_steps).
        truncated = elapsed >= max_episode_plies
        done = env.terminated | truncated
        reward = jnp.where(env.terminated,
                           eng.outcome_for(env, sp.pcolor, cfg), 0.0)
        emit = Transition(obs=sp.pending.obs, action=sp.pending.action,
                          logp=sp.pending.logp, value=sp.pending.value,
                          reward=reward, done=done, legal=sp.pending.legal)

        env, rand_left, pcolor, env_keys = reset_done(
            eng, env, rand_left, sp.pcolor, env_keys, done, cfg,
            init_rand_steps)
        elapsed = jnp.where(done, 0, elapsed)

        env, rand_left, env_keys = advance_opponent(
            opp_params, apply_fn, eng, env, rand_left, env_keys, pcolor,
            cfg, rand_openings)
        env, rand_left, env_keys, pending = protagonist_act(
            params, apply_fn, eng, env, rand_left, env_keys, cfg,
            logp_mode, rand_openings)
        elapsed = elapsed + 1

        return (SelfPlayState(env=env, rand_left=rand_left, pcolor=pcolor,
                              env_keys=env_keys, pending=pending,
                              key=sp.key), elapsed), (emit, truncated)

    (sp, elapsed), (rollout, bad) = jax.lax.scan(
        slot, (sp, elapsed), None, length=num_steps)
    return sp, elapsed, rollout, bad, sp.pending.value


# ---------------------------------------------------------------------------
# Recurrent (GRU) self-play collection — hidden-state threading for
# PolicyNet(recurrent=True), the working end-to-end counterpart of the
# vendored ``NNBase._forward_gru`` recurrence (model.py:230-285) whose
# masked-action training path the fork itself hard-errors on
# (algo/ppo.py:44-46).  Kept separate from the feed-forward collector
# above: that one is the perf-critical bench path.
#
# Hidden-state semantics: each color's decision stream is a GRU sequence.
# The protagonist stream is what the update replays (ppo_update_recurrent):
# ``pending.h`` stores the hidden state INPUT consumed by the pending
# decision, so the rollout's ``h0`` is simply the first pending's input and
# ``masks[t] = 1 - done[t-1]`` reproduces the live resets (games reset in
# the same slot their terminal transition is emitted; both streams are
# zeroed there).  The opponent color (mirror policy or a frozen pool
# snapshot) carries its own hidden stream, advanced only on plies it
# actually takes.

@struct.dataclass
class RecPending:
    obs: jnp.ndarray      # (N, C, B, B) int8
    action: jnp.ndarray   # (N,)
    logp: jnp.ndarray     # (N,)
    value: jnp.ndarray    # (N,)
    legal: jnp.ndarray    # (N, A)
    h: jnp.ndarray        # (N, H) hidden INPUT of this decision


@struct.dataclass
class RecSelfPlayState:
    env: object
    rand_left: jnp.ndarray
    pcolor: jnp.ndarray
    env_keys: jnp.ndarray
    pending: RecPending
    h_prot: jnp.ndarray   # (N, H) protagonist hidden AFTER the pending
    h_opp: jnp.ndarray    # (N, H) opponent-stream hidden
    key: jax.Array


def policy_sample_rec(params, apply_fn, eng, env, keys, h):
    """Recurrent ``policy_sample``: ``apply_fn(params, obs, h, mask) ->
    (logits, value, h')``.  Resets are handled by zeroing ``h`` at game
    boundaries, so the in-flight mask is all-ones."""
    obs = eng.featurize(env)
    legal = eng.legal_flat(env)
    logits, value, h_new = apply_fn(params, obs, h,
                                    jnp.ones(h.shape[:1], obs.dtype))
    dist = MaskedCategorical(logits=logits, mask=legal)
    action = dist.sample(keys[0])   # one batched categorical (see above)
    logp = dist.log_prob(action)
    return obs, legal, action, logp, value, h_new


def advance_opponent_rec(params, apply_fn, eng, env, rand_left, keys,
                         pcolor, h_opp, cfg: EnvConfig):
    """Recurrent ``advance_opponent``: steps opponent-to-move games,
    advancing the opponent hidden stream only where a ply was taken."""
    def needs(env):
        return (~env.terminated) & (env.turn != pcolor)

    def cond(carry):
        env, _, _, _ = carry
        return needs(env).any()

    def body(carry):
        env, rand_left, keys, h_opp = carry
        do = needs(env)
        keys, sample_keys = split_each(keys)
        _, _, action, _, _, h_new = policy_sample_rec(
            params, apply_fn, eng, env, sample_keys, h_opp)
        h_opp = jnp.where(do[:, None], h_new, h_opp)
        env, rand_left, keys = masked_step(eng, env, rand_left, keys,
                                           action, do, cfg)
        return env, rand_left, keys, h_opp

    return jax.lax.while_loop(cond, body, (env, rand_left, keys, h_opp))


def _rec_protagonist_act(params, apply_fn, eng, env, rand_left, keys,
                         h_prot, cfg):
    keys, sample_keys = split_each(keys)
    obs, legal, action, logp, value, h_new = policy_sample_rec(
        params, apply_fn, eng, env, sample_keys, h_prot)
    num_envs = action.shape[0]
    env, rand_left, keys = masked_step(
        eng, env, rand_left, keys, action, jnp.ones((num_envs,), bool),
        cfg)
    pending = RecPending(obs=obs.astype(jnp.int8), action=action,
                         logp=logp, value=value, legal=legal, h=h_prot)
    return env, rand_left, keys, pending, h_new


def selfplay_init_recurrent(params, apply_fn, key: jax.Array,
                            cfg: EnvConfig, num_envs: int,
                            hidden_size: int,
                            init_rand_steps: int = 0,
                            force_plane: bool = False,
                            opp_params=None) -> RecSelfPlayState:
    """Fresh games + first protagonist decision with zero hidden states."""
    eng = get_engine(cfg, force_plane)
    if opp_params is None:
        opp_params = params
    key, k_env, k_color, k_rand = jax.random.split(key, 4)
    env_keys = jax.random.split(k_env, num_envs)
    env = eng.reset_batch(num_envs, cfg)
    rand_left = jax.vmap(draw_max_rand_steps, in_axes=(0, None))(
        jax.random.split(k_rand, num_envs), init_rand_steps)
    pcolor = (jax.random.randint(k_color, (num_envs,), 0, 2) * 2
              - 1).astype(jnp.int8)
    h_prot = jnp.zeros((num_envs, hidden_size), jnp.float32)
    h_opp = jnp.zeros((num_envs, hidden_size), jnp.float32)

    env, rand_left, env_keys, h_opp = advance_opponent_rec(
        opp_params, apply_fn, eng, env, rand_left, env_keys, pcolor,
        h_opp, cfg)
    env, rand_left, env_keys, pending, h_prot = _rec_protagonist_act(
        params, apply_fn, eng, env, rand_left, env_keys, h_prot, cfg)
    return RecSelfPlayState(env=env, rand_left=rand_left, pcolor=pcolor,
                            env_keys=env_keys, pending=pending,
                            h_prot=h_prot, h_opp=h_opp, key=key)


def collect_rollout_recurrent(params, apply_fn, sp: RecSelfPlayState,
                              cfg: EnvConfig, num_steps: int,
                              init_rand_steps: int = 0,
                              force_plane: bool = False,
                              opp_params=None):
    """Scan ``num_steps`` slots with GRU hidden threading; returns
    (new_state, Transition (T, N, ...), h0 (N, H), masks (T, N),
    bootstrap_value (N,)) — exactly the inputs ``ppo_update_recurrent``
    replays."""
    eng = get_engine(cfg, force_plane)
    if opp_params is None:
        opp_params = params
    h0 = sp.pending.h

    def slot(sp: RecSelfPlayState, _):
        env, rand_left, env_keys, h_opp = advance_opponent_rec(
            opp_params, apply_fn, eng, sp.env, sp.rand_left, sp.env_keys,
            sp.pcolor, sp.h_opp, cfg)

        done = env.terminated
        reward = jnp.where(done, eng.outcome_for(env, sp.pcolor, cfg), 0.0)
        emit = Transition(obs=sp.pending.obs, action=sp.pending.action,
                          logp=sp.pending.logp, value=sp.pending.value,
                          reward=reward, done=done, legal=sp.pending.legal)

        env, rand_left, pcolor, env_keys = reset_done(
            eng, env, rand_left, sp.pcolor, env_keys, done, cfg,
            init_rand_steps)
        # Zero both hidden streams for fresh games.
        h_prot = jnp.where(done[:, None], 0.0, sp.h_prot)
        h_opp = jnp.where(done[:, None], 0.0, h_opp)

        env, rand_left, env_keys, h_opp = advance_opponent_rec(
            opp_params, apply_fn, eng, env, rand_left, env_keys, pcolor,
            h_opp, cfg)

        env, rand_left, env_keys, pending, h_prot = _rec_protagonist_act(
            params, apply_fn, eng, env, rand_left, env_keys, h_prot, cfg)

        return RecSelfPlayState(env=env, rand_left=rand_left,
                                pcolor=pcolor, env_keys=env_keys,
                                pending=pending, h_prot=h_prot,
                                h_opp=h_opp, key=sp.key), emit

    sp, rollout = jax.lax.scan(slot, sp, None, length=num_steps)
    masks = jnp.concatenate(
        [jnp.ones((1,) + rollout.done.shape[1:], jnp.float32),
         1.0 - rollout.done[:-1].astype(jnp.float32)])
    return sp, rollout, h0, masks, sp.pending.value
