"""PPO self-play trainer assembly: jitted train/eval steps, metrics,
checkpoints — the end-to-end equivalent of ``ppo_run_self_play.test()``
(ppo_run_self_play.py:41-241) on one or many TPU chips.
"""

from __future__ import annotations

import dataclasses
import random as pyrandom
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from gymothelloenv_tpu.agents.ppo import (PPOConfig, make_optimizer,
                                          ppo_update,
                                          ppo_update_recurrent)
from gymothelloenv_tpu.core.featurize import make_state
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.models.nets import PolicyNet
from gymothelloenv_tpu.policies.scripted import (greedy_policy,
                                                 random_policy)
from gymothelloenv_tpu.train.self_play import (collect_rollout,
                                               collect_rollout_recurrent,
                                               collect_rollout_time_limited,
                                               selfplay_init,
                                               selfplay_init_recurrent)
from gymothelloenv_tpu.train.tournament import play_games_impl
from gymothelloenv_tpu.utils.tpu import fetch_scalar
from gymothelloenv_tpu.utils.checkpoint import (load_checkpoint,
                                                save_checkpoint)


@dataclasses.dataclass(frozen=True)
class SelfPlayConfig:
    """Trainer knobs; reference values in comments
    (ppo_run_self_play.py:59-70, :41-56)."""
    num_envs: int = 256            # reference: 8 worker processes
    num_steps: int = 64            # rollout length T (args.num_steps)
    init_rand_steps: int = 0       # env_init_rand_steps (train)
    test_init_rand_steps: int = 10
    num_test_games: int = 200
    test_interval: int = 100       # in updates (reference: 500 episodes)
    save_interval: int = 500
    seed: int = 0
    bf16: bool = False             # bfloat16 net compute (params fp32)
    # Capacity knobs beyond reference parity (RESULTS.md documents a
    # strength plateau at the parity net's capacity):
    hidden_size: int = 512         # fc width (reference: 512)
    width_mult: int = 1            # trunk channel multiplier
    # Opponent pool (league-lite, beyond reference): when > 0, the
    # NON-learning color of each rollout is played by a frozen snapshot
    # drawn uniformly from the last ``opponent_pool`` snapshots (pushed
    # every ``pool_interval`` updates) instead of the live net.  Mirror
    # self-play over-exploits its own current policy late in training
    # (RESULTS.md: 10000-update run WORSE than 4000 vs scripted
    # opponents); a pool keeps the opponent distribution broad.  0 =
    # reference-parity mirror self-play.
    opponent_pool: int = 0
    pool_interval: int = 250
    # EXTERNAL anchor checkpoints mixed into the opponent pool (round-5
    # probe: the raw-H2H weakness of search-bootstrapped nets survived
    # every SELF-derived opponent variation — snapshot pools are
    # themselves near-deterministic search-induced policies.  Anchors
    # pin a broad-sampling-distribution opponent, e.g. wide2_4k, into
    # the draw permanently: never evicted, uniform with the snapshots).
    # Paths must hold the SAME architecture as the training net (the
    # collector applies the training apply_fn to the opponent params).
    # Requires opponent_pool > 0.  The reference's curriculum idea
    # (run_self_play.py:213-282 rotates scripted opponent classes)
    # generalized to checkpoint opponents.
    pool_anchors: tuple = ()
    # GRU-recurrent policy (model.py:230-285 rebuilt working; see
    # agents.ppo.ppo_update_recurrent — the fork hard-errors on masked
    # actions here, algo/ppo.py:44-46).  num_envs must divide by
    # PPOConfig.num_mini_batch (env-subset minibatches).
    recurrent: bool = False
    # Channel frame stacking (VecPyTorchFrameStack, vendored
    # envs.py:210-250): the policy sees the last K canonical
    # observations stacked over channels (newest last), zeroed at
    # episode starts.  Implemented as a stateless "recurrent cell"
    # whose hidden state holds the previous K-1 frames, so the
    # recurrent collector/update/eval machinery drives it unchanged
    # (make_apply_fn_framestack).  1 = off (reference Othello parity;
    # the board is fully observable, this is a capability path).
    # Mutually exclusive with ``recurrent``.
    frame_stack: int = 1
    # Episode step cap (gym TimeLimit + the fork's TimeLimitMask,
    # vendored envs.py:110-119 + storage.py:79-96): episodes are
    # truncated after this many protagonist decisions, truncations are
    # flagged bad_transition, and GAE switches to the proper-time-limit
    # variant (advantage zeroed at the cap instead of bootstrapping a
    # fictitious terminal).  0 = off (Othello games end on their own;
    # this is the capability path for the vendored semantics,
    # collect_rollout_time_limited).  Feed-forward only.
    max_episode_plies: int = 0
    # Scan this many train steps inside ONE jitted program — amortizes
    # the per-dispatch host/tunnel overhead (~4 ms/step on the axon
    # backend) for sustained-throughput runs.  Logging/eval/checkpoint
    # cadence quantizes to the chain length and ``train(num_updates)``
    # rounds the total UP to a multiple of it (a shorter final chain
    # would force a recompile); incompatible with opponent_pool (the
    # pool re-draws a snapshot per update on host).
    chain_updates: int = 1
    # Search-bootstrapped collection (round-4 probe, VERDICT item 5):
    # the protagonist ACTS with the 1-ply value-lookahead operator
    # (executed + stored actions = lookahead choice; the raw policy's
    # log-prob of that action is stored so PPO ratios start at 1), while
    # the update trains the RAW net — pair with PPOConfig.distill for
    # approximate policy iteration, or leave the clipped surrogate for
    # PPO on the induced distribution.  Opponent (mirror/pool) plies
    # keep sampling from the raw policy.  Feed-forward only.
    lookahead_collect: bool = False
    # Softmax temperature over child values for the lookahead override
    # (0 = argmax; the value scale is the training disk-diff scale ±64).
    lookahead_tau: float = 0.0
    # Fraction of updates whose COLLECTION uses the lookahead override
    # (round-5 regime-mix probe: alternating search-guided and plain
    # sampling collection keeps the raw distribution's support broad
    # while still importing the search signal).  1.0 = every update
    # (round-4 variant B); only meaningful with lookahead_collect.
    # Updates are interleaved deterministically (Bresenham accumulator),
    # e.g. 0.5 alternates strictly.
    lookahead_mix: float = 1.0


def make_network(cfg: EnvConfig, recurrent: bool = False,
                 bf16: bool = False, trunk_impl: str = "conv",
                 hidden_size: int = 512,
                 width_mult: int = 1) -> PolicyNet:
    return PolicyNet(num_actions=cfg.num_actions, recurrent=recurrent,
                     dtype=jnp.bfloat16 if bf16 else jnp.float32,
                     trunk_impl=trunk_impl, hidden_size=hidden_size,
                     width_mult=width_mult)


def make_apply_fn(net: PolicyNet):
    def apply_fn(params, obs):
        return net.apply(params, obs)
    return apply_fn


def make_apply_fn_recurrent(net: PolicyNet):
    """(params, obs, h, mask) -> (logits, value, h') for
    PolicyNet(recurrent=True)."""
    def apply_fn(params, obs, h, mask):
        return net.apply(params, obs, h, mask)
    return apply_fn


def make_split_fns(net: PolicyNet):
    """(features, core, heads) decomposition of the recurrent PolicyNet
    for the batched-trunk recurrent update (see ppo_update_recurrent's
    ``split_fns``)."""
    def features(params, obs):
        return net.apply(params, obs, method=PolicyNet.features)

    def core(params, feat, h, mask):
        return net.apply(params, feat, h, mask, method=PolicyNet.core)

    def heads(params, y):
        return net.apply(params, y, method=PolicyNet.heads)

    return features, core, heads


def make_apply_fn_framestack(net: PolicyNet, nstack: int, cfg: EnvConfig):
    """Frame stacking as a recurrent cell: ``h`` flat-packs the previous
    ``nstack-1`` frames; the cell feeds ``[h-frames, obs]`` (newest in
    the last C channels) to the feed-forward net and shifts the window.
    ``h * mask`` zeroes the history at episode starts — together these
    reproduce ``envs.vec_wrappers.frame_stack_init/step`` exactly
    (gated by tests/test_vec_wrappers.py), while letting the recurrent
    collector, ``ppo_update_recurrent`` and ``play_games_recurrent``
    drive frame stacking with no new machinery.  (Vendored
    VecPyTorchFrameStack, envs.py:210-250.)"""
    C, B = 4, cfg.board_size
    hidden = (nstack - 1) * C * B * B

    def apply_fn(params, obs, h, mask):
        n = obs.shape[0]
        prev = (h * mask[:, None]).reshape(n, (nstack - 1) * C, B, B)
        x = jnp.concatenate([prev, obs.astype(prev.dtype)], axis=1)
        logits, value, _ = net.apply(params, x)
        return logits, value, x[:, C:].reshape(n, hidden)

    apply_fn.hidden_size = hidden
    return apply_fn


def net_sampling_cell(params, apply_fn):
    """Batched stateful tournament actor ``(keys, states, h) -> (actions,
    h_new)``: advance the recurrent core on the batch observations and
    sample the masked logits — the recurrent analogue of
    :func:`net_tournament_policy` (reference GRU Policy.act,
    model.py:60-98 + _forward_gru :230-285)."""
    def cell(keys, states, h):
        n = keys.shape[0]
        obs = jax.vmap(make_state)(states)
        logits, _, h_new = apply_fn(params, obs, h,
                                    jnp.ones((n,), jnp.float32))
        a = jax.vmap(lambda lg, m, k: MaskedCategorical(
            logits=lg, mask=m).sample(k))(logits, states.legal, keys)
        return a, h_new
    return cell


def net_lookahead_cell_recurrent(params, apply_fn, cfg: EnvConfig,
                                 depth: int = 1):
    """Recurrent 1-ply value lookahead: carry the GRU hidden through the
    expansion.  The hidden first consumes the CURRENT observation
    (``h_cur``), then every child is scored by one batched core step from
    ``h_cur`` over the child observation — the value head sees the child
    with the game's full history.  The actor's own hidden thread advances
    to ``h_cur`` exactly as the sampling cell's does, so the speculative
    child hiddens never leak into the carried state.

    Only depth 1 is supported: depth-2 would need ``A^2`` hidden threads
    per game live at once (``A`` child hiddens each expanded ``A`` ways),
    which multiplies the already-dominant GRU cost by 64x for a result
    the feed-forward depth-2 path measures anyway (COMPONENTS.md)."""
    from gymothelloenv_tpu.core import state as core

    if depth != 1:
        raise NotImplementedError(
            "recurrent lookahead supports depth 1 only (depth-2 would "
            "thread A^2 speculative hiddens per game)")
    A = cfg.num_actions
    NEG = -jnp.float32(1e9)

    def cell(keys, states, h):
        del keys
        n = h.shape[0]
        obs = jax.vmap(make_state)(states)
        _, _, h_cur = apply_fn(params, obs, h,
                               jnp.ones((n,), jnp.float32))
        actions = jnp.arange(A, dtype=jnp.int32)
        res = jax.vmap(lambda s: jax.vmap(
            lambda a: core.step(s, a, cfg))(actions))(states)   # (n, A)
        ch = res.state
        ch_flat = jax.tree.map(
            lambda x: x.reshape((n * A,) + x.shape[2:]), ch)
        ch_obs = jax.vmap(make_state)(ch_flat).astype(jnp.float32)
        h_rep = jnp.repeat(h_cur, A, axis=0)
        _, v, _ = apply_fn(params, ch_obs, h_rep,
                           jnp.ones((n * A,), jnp.float32))
        v = v.reshape(n, A)
        mover_v = jnp.where(ch.turn == states.turn[:, None], v, -v)
        vals = jnp.where(ch.terminated, res.reward, mover_v)
        a = jnp.argmax(jnp.where(states.legal, vals, NEG), axis=1)
        return a.astype(jnp.int32), h_cur

    return cell


def play_games_recurrent(key, cfg: EnvConfig, params, apply_fn,
                         opp_policy, num_games: int, net_color: int,
                         init_rand_steps: int = 0,
                         hidden_size: int = 512,
                         act_cell=None, opp_cell=None,
                         opp_hidden_size: int = 0):
    """Eval games for a recurrent net vs an opponent, threading the net's
    GRU hidden per game.  The hidden advances on every live ply where it
    is the net's turn — INCLUDING random-opening plies, because the
    training collector advances ``h_prot`` on every protagonist decision
    (the random override replaces the executed action, not the decision;
    self_play._rec_protagonist_act).  Returns winners int8.

    ``act_cell``: optional batched stateful actor ``(keys, states, h) ->
    (actions, h_new)`` replacing the default sampling cell (e.g. the
    recurrent lookahead).  ``opp_cell``/``opp_hidden_size``: when given,
    the OPPONENT is stateful too (a second recurrent checkpoint as the
    head-to-head opponent), with its own hidden thread advanced on its
    own live turns; otherwise ``opp_policy`` is a stateless ``(key,
    state) -> action`` policy."""
    from gymothelloenv_tpu.core import state as core
    from gymothelloenv_tpu.policies.scripted import random_action
    from gymothelloenv_tpu.train.tournament import (_policy_call,
                                                    draw_max_rand_steps)

    max_plies = cfg.board_size * cfg.board_size
    game_keys = jax.random.split(key, num_games + 1)
    key = game_keys[0]
    states = jax.vmap(lambda _: core.reset(cfg))(jnp.arange(num_games))
    rand_left = jax.vmap(draw_max_rand_steps, in_axes=(0, None))(
        game_keys[1:], init_rand_steps)
    h = jnp.zeros((num_games, hidden_size), jnp.float32)
    h_opp = jnp.zeros((num_games, opp_hidden_size), jnp.float32)
    cell = act_cell if act_cell is not None else net_sampling_cell(
        params, apply_fn)

    def cond(carry):
        states = carry[0]
        return (~states.terminated.all()) & (carry[5] < max_plies)

    def body(carry):
        states, rand_left, key, h, h_opp, ply = carry
        key, k_rand, k_net, k_opp = jax.random.split(key, 4)
        n = num_games
        a_net, h_new = cell(jax.random.split(k_net, n), states, h)
        if opp_cell is None:
            a_opp = _policy_call(opp_policy, jax.random.split(k_opp, n),
                                 states)
            h_opp_new = h_opp
        else:
            a_opp, h_opp_new = opp_cell(jax.random.split(k_opp, n),
                                        states, h_opp)
        a_rand = jax.vmap(random_action)(jax.random.split(k_rand, n),
                                         states.legal)
        net_turn = states.turn == net_color
        action = jnp.where(rand_left > 0, a_rand,
                           jnp.where(net_turn, a_net, a_opp))
        live = ~states.terminated
        h = jnp.where((net_turn & live)[:, None], h_new, h)
        h_opp = jnp.where((~net_turn & live)[:, None], h_opp_new, h_opp)

        stepped = jax.vmap(core.step, in_axes=(0, 0, None))(
            states, action, cfg)
        new_states = jax.tree.map(
            lambda new, old: jnp.where(
                live.reshape((-1,) + (1,) * (old.ndim - 1)), new, old),
            stepped.state, states)
        new_rand_left = jnp.where(live, jnp.maximum(rand_left - 1, 0),
                                  rand_left)
        return new_states, new_rand_left, key, h, h_opp, ply + 1

    states, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (states, rand_left, key, h, h_opp, jnp.int32(0)))
    return states.winner


def load_eval_policy(path: str, cfg: EnvConfig):
    """Load any policy checkpoint for evaluation: a native msgpack
    (capacity knobs inferred from stored shapes) or a reference torch
    ``.pth``/``.pt`` (converted via compat.torch_import).

    Returns ``(params, apply_fn, description)``.
    """
    if path.endswith((".pth", ".pt")):
        from gymothelloenv_tpu.compat.torch_import import (
            detect_and_import, imported_apply_fn, load_torch_checkpoint)
        kind, params = detect_and_import(load_torch_checkpoint(path))
        return params, imported_apply_fn(kind, cfg), (
            f"torch checkpoint (architecture: {kind})")

    from flax import serialization

    from gymothelloenv_tpu.utils.checkpoint import load_checkpoint
    step, raw_params, _, _ = load_checkpoint(path)
    trunk = raw_params["params"]["ConvTrunk_0"]
    width_mult = int(trunk["Conv_0"]["kernel"].shape[-1]) // 32
    hidden_size = int(raw_params["params"]["Dense_0"]["kernel"].shape[-1])
    recurrent = "GRUCore_0" in raw_params["params"]
    # Frame-stacked nets are plain conv nets whose first layer consumes
    # 4*K channels — infer K from the stored kernel.
    frame_stack = int(trunk["Conv_0"]["kernel"].shape[-2]) // 4
    net = make_network(cfg, recurrent=recurrent, hidden_size=hidden_size,
                       width_mult=width_mult)
    dummy = jnp.zeros((1, 4 * frame_stack, cfg.board_size,
                       cfg.board_size))
    if recurrent:
        template = jax.eval_shape(
            lambda k: net.init(k, dummy, jnp.zeros((1, hidden_size)),
                               jnp.ones((1,))),
            jax.random.PRNGKey(0))
        apply_fn = make_apply_fn_recurrent(net)
        state_size = hidden_size
    elif frame_stack > 1:
        template = jax.eval_shape(lambda k: net.init(k, dummy),
                                  jax.random.PRNGKey(0))
        apply_fn = make_apply_fn_framestack(net, frame_stack, cfg)
        state_size = apply_fn.hidden_size
    else:
        template = jax.eval_shape(lambda k: net.init(k, dummy),
                                  jax.random.PRNGKey(0))
        apply_fn = make_apply_fn(net)
        state_size = hidden_size
    # Callers that can thread policy state branch on these attributes
    # (cli/eval_checkpoint uses play_games_recurrent when set; a
    # frame-stacked net rides the same path — its "hidden" is the
    # frame window).
    apply_fn.recurrent = recurrent or frame_stack > 1
    apply_fn.hidden_size = state_size
    params = serialization.from_state_dict(template, raw_params)
    extra = ("" if width_mult == 1 and hidden_size == 512 else
             f", width_mult={width_mult}, hidden={hidden_size}")
    extra += ", recurrent" if recurrent else ""
    extra += f", frame_stack={frame_stack}" if frame_stack > 1 else ""
    return params, apply_fn, f"step {step}{extra}"


def chain_train_steps(step, chain: int):
    """Scan ``chain`` invocations of a train step into one jittable call
    (amortizes the per-dispatch tunnel overhead, RESULTS.md
    "--chain-updates").

    ``step``'s LAST positional argument must be a PRNG key and the last
    element of its return tuple the metrics dict; everything else is the
    scan carry.  The wrapper keeps the same signature (one key in,
    split into per-step keys) and returns the FINAL iteration's metrics
    — the ``train()`` loop logs once per chain.
    """
    def chained(*args):
        *carry, key = args

        def body(c, k):
            out = step(*c, k)
            return tuple(out[:-1]), out[-1]

        carry, ms = jax.lax.scan(body, tuple(carry),
                                 jax.random.split(key, chain))
        return (*carry, jax.tree.map(lambda x: x[-1], ms))

    return chained


def net_lookahead_policy(params, apply_fn, cfg: EnvConfig,
                         depth: int = 1, beam_k: int = 8):
    """Eval-time value lookahead (a policy-improvement operator the
    reference has no counterpart for): expand legal moves with the exact
    rules engine, score leaves with the trained VALUE head (negated when
    the leaf's player-to-move is the opponent — the head estimates return
    for the player to move), take terminal leaves' true reward, and back
    up max/min by whose turn each node is (the engine resolves passes
    inside ``step``, so a child can be a max node again).

    ``depth`` = 1: one batched forward over the ``A`` children per
    decision.  ``depth`` = 2: expand all ``A x A`` grandchildren, ONE
    forward over the flattened batch, opponent (or forced-pass mover)
    best-reply backup at each child.  ``depth`` = 3 (round-5 probe,
    VERDICT r4 item 8): BEAM search — rank the root's children by their
    depth-1 value, keep the top ``beam_k`` legal ones, and give each
    survivor an EXACT depth-2 minimax backup (its full ``A x A``
    expansion); live memory is ``beam_k x A^2`` per game (linear in the
    beam) instead of the full ``A^3``.  Pruning happens only at the
    ROOT (a max node we control), so the risk is missing a move that
    looks bad at depth 1 but great at depth 3 — never misjudging an
    opponent reply.  ``beam_k = A`` degenerates to exact depth-3.  The
    memory story for large game batches is handled by wrapping this
    policy with ``policies.chunking.chunked_batched``.

    ``cfg`` must use the TRAINING reward scale (``num_disk_as_reward=True``
    for every trainer here) so terminal rewards and value estimates are
    commensurable.  Feed-forward nets only (child evaluation has no
    hidden-state thread).  Motivation: RESULTS.md round 3 pins the
    self-play plateau (~65-70% vs maximin-2) on the scripted opponents'
    search advantage; this hands the net the same search advantage at
    eval time without retraining."""
    from gymothelloenv_tpu.core import state as core

    if depth not in (1, 2, 3):
        raise ValueError(f"lookahead depth must be 1, 2 or 3, got {depth}")
    A = cfg.num_actions
    if depth == 3 and not 1 <= beam_k <= A:
        raise ValueError(f"beam_k must be in [1, {A}], got {beam_k}")
    NEG = -jnp.float32(1e9)

    def leaf_values(states_flat, rewards_flat, root_turn):
        """Root-perspective values of a flat batch of leaf nodes."""
        obs = jax.vmap(make_state)(states_flat).astype(jnp.float32)
        _, v, _ = apply_fn(params, obs)
        mover_v = jnp.where(states_flat.turn == root_turn, v, -v)
        return jnp.where(states_flat.terminated, rewards_flat, mover_v)

    def child_depth2_value(c, rc_rootp, root_turn):
        """Exact depth-2 minimax value (root perspective) of one root
        child ``c`` whose root-perspective terminal reward is
        ``rc_rootp``: expand c's replies and their replies, evaluate the
        great-grandchild frontier with the value head, back up by whose
        turn each node is (the engine resolves passes inside step)."""
        actions = jnp.arange(A, dtype=jnp.int32)
        res2 = jax.vmap(lambda b: core.step(c, b, cfg))(actions)
        gc = res2.state
        r2 = jnp.where(c.turn == root_turn, res2.reward, -res2.reward)
        res3 = jax.vmap(lambda g: jax.vmap(
            lambda d: core.step(g, d, cfg))(actions))(gc)
        ggc_flat = jax.tree.map(
            lambda x: x.reshape((A * A,) + x.shape[2:]), res3.state)
        r3 = jnp.where(gc.turn[:, None] == root_turn,
                       res3.reward, -res3.reward).reshape(A * A)
        ggc_vals = leaf_values(ggc_flat, r3, root_turn).reshape(A, A)
        gc_is_max = gc.turn == root_turn
        gc_best = jnp.where(
            gc_is_max,
            jnp.max(jnp.where(gc.legal, ggc_vals, NEG), axis=1),
            jnp.min(jnp.where(gc.legal, ggc_vals, -NEG), axis=1))
        gc_vals = jnp.where(gc.terminated, r2, gc_best)
        c_is_max = c.turn == root_turn
        c_best = jnp.where(
            c_is_max,
            jnp.max(jnp.where(c.legal, gc_vals, NEG)),
            jnp.min(jnp.where(c.legal, gc_vals, -NEG)))
        return jnp.where(c.terminated, rc_rootp, c_best)

    def act(key, state):
        del key
        actions = jnp.arange(A, dtype=jnp.int32)
        res = jax.vmap(lambda a: core.step(state, a, cfg))(actions)
        children = res.state
        if depth == 3:
            # Beam: rank children by depth-1 value, exact depth-2
            # backup under the top beam_k.  Tie-break: among equal DEEP
            # values the higher depth-1 rank wins (top_k breaks depth-1
            # ties toward the lower action index).
            vals_d1 = leaf_values(children, res.reward, state.turn)
            ranked = jnp.where(state.legal, vals_d1, NEG)
            _, idx = jax.lax.top_k(ranked, beam_k)
            sel = jax.tree.map(lambda x: x[idx], children)
            deep = jax.vmap(child_depth2_value,
                            in_axes=(0, 0, None))(sel, res.reward[idx],
                                                  state.turn)
            deep = jnp.where(state.legal[idx], deep, NEG)
            return idx[jnp.argmax(deep)].astype(jnp.int32)
        if depth == 1:
            vals = leaf_values(children, res.reward, state.turn)
        else:
            # Expand every child's replies: (A, A) grandchildren.
            res2 = jax.vmap(lambda c: jax.vmap(
                lambda b: core.step(c, b, cfg))(actions))(children)
            gc_flat = jax.tree.map(
                lambda x: x.reshape((A * A,) + x.shape[2:]), res2.state)
            # Grandchild terminal rewards are from the CHILD mover's
            # perspective; flip to root when the child mover is the
            # opponent.
            r2 = jnp.where(children.turn[:, None] == state.turn,
                           res2.reward, -res2.reward).reshape(A * A)
            gc_vals = leaf_values(gc_flat, r2, state.turn).reshape(A, A)
            # Back up the child's best reply: max if the child node's
            # mover is the root player (forced pass), else opponent min.
            child_legal = children.legal            # (A, B*B) reply mask
            is_max = children.turn == state.turn    # (A,)
            best = jnp.where(
                is_max,
                jnp.max(jnp.where(child_legal, gc_vals, NEG), axis=1),
                jnp.min(jnp.where(child_legal, gc_vals, -NEG), axis=1))
            # Terminal children take their exact reward (root mover).
            vals = jnp.where(children.terminated, res.reward, best)
        return jnp.argmax(
            jnp.where(state.legal, vals, NEG)).astype(jnp.int32)

    return act


def net_tournament_policy(params, apply_fn):
    """Wrap the net as a tournament ``act(key, state)`` policy (sampling,
    like ``Policy.act`` served over pipes in rule_base_game,
    ppo_run_self_play.py:383-389)."""
    def act(key, state):
        obs = make_state(state)[None]
        logits, _, _ = apply_fn(params, obs)
        dist = MaskedCategorical(logits=logits[0], mask=state.legal)
        return dist.sample(key)
    return act


class PPOSelfPlayTrainer:
    """``mesh``: optional ``jax.sharding.Mesh`` with a 'data' axis — the
    game batch and every (T, N) rollout leaf shard over 'data' and the
    whole step runs as one GSPMD program with replicated params (the
    tensor-parallel variant lives in parallel/dp.py).  1-vs-8-device
    parity: tests/test_sharded_trainers.py."""

    def __init__(self, env_cfg: EnvConfig = None,
                 ppo_cfg: PPOConfig = None,
                 run_cfg: SelfPlayConfig = None,
                 log_fn: Optional[Callable] = None, mesh=None):
        self.env_cfg = env_cfg or EnvConfig(num_disk_as_reward=True)
        self.ppo_cfg = ppo_cfg or PPOConfig()
        self.run_cfg = run_cfg or SelfPlayConfig()
        self.log_fn = log_fn
        self.mesh = mesh
        if self.run_cfg.opponent_pool > 0 and self.run_cfg.pool_interval < 1:
            raise ValueError(
                f"pool_interval must be >= 1 when opponent_pool is on "
                f"(got {self.run_cfg.pool_interval})")
        if self.run_cfg.pool_anchors and self.run_cfg.opponent_pool <= 0:
            raise ValueError("pool_anchors requires opponent_pool > 0 "
                             "(anchors join the snapshot pool's draw)")

        recurrent = self.run_cfg.recurrent
        nstack = self.run_cfg.frame_stack
        stacked = nstack > 1
        if recurrent and stacked:
            raise ValueError("recurrent and frame_stack are mutually "
                             "exclusive (both thread policy state)")
        # Both paths ride the recurrent collector/update machinery.
        rec_like = recurrent or stacked
        time_limited = self.run_cfg.max_episode_plies > 0
        if time_limited and rec_like:
            raise ValueError("max_episode_plies is feed-forward only")
        if self.run_cfg.lookahead_collect and (rec_like or time_limited):
            raise ValueError("lookahead_collect needs the plain "
                             "feed-forward collector (no recurrent/"
                             "frame-stack/max_episode_plies)")
        if rec_like and self.run_cfg.num_envs % self.ppo_cfg.num_mini_batch:
            raise ValueError(
                f"recurrent/frame-stack PPO needs num_envs "
                f"({self.run_cfg.num_envs}) divisible by num_mini_batch "
                f"({self.ppo_cfg.num_mini_batch})")
        self.net = make_network(self.env_cfg, recurrent=recurrent,
                                bf16=self.run_cfg.bf16,
                                hidden_size=self.run_cfg.hidden_size,
                                width_mult=self.run_cfg.width_mult)
        if recurrent:
            self.apply_fn = make_apply_fn_recurrent(self.net)
            self._policy_state_size = self.run_cfg.hidden_size
            self._split_fns = make_split_fns(self.net)
        elif stacked:
            self.apply_fn = make_apply_fn_framestack(self.net, nstack,
                                                     self.env_cfg)
            self._policy_state_size = self.apply_fn.hidden_size
        else:
            self.apply_fn = make_apply_fn(self.net)
            self._policy_state_size = 0
        if not recurrent:
            self._split_fns = None
        self.optimizer = make_optimizer(self.ppo_cfg)

        key = jax.random.PRNGKey(self.run_cfg.seed)
        self.key, k_init = jax.random.split(key)
        B_ = self.env_cfg.board_size
        dummy = jnp.zeros((1, 4 * nstack, B_, B_))
        if recurrent:
            self.params = self.net.init(
                k_init, dummy,
                jnp.zeros((1, self.run_cfg.hidden_size)),
                jnp.ones((1,)))
        else:
            self.params = self.net.init(k_init, dummy)
        self.opt_state = self.optimizer.init(self.params)
        self.update_count = 0
        self.sp_state = None

        env_cfg_ = self.env_cfg
        ppo_cfg_ = self.ppo_cfg
        run_cfg_ = self.run_cfg
        apply_fn = self.apply_fn
        optimizer = self.optimizer

        use_pool = run_cfg_.opponent_pool > 0
        act_override = None
        if run_cfg_.lookahead_collect:
            from gymothelloenv_tpu.train.self_play import (
                make_lookahead_override)
            act_override = make_lookahead_override(
                env_cfg_, run_cfg_.lookahead_tau)
        self._act_override = act_override
        mesh = self.mesh
        if mesh is not None:
            from gymothelloenv_tpu.parallel.sharding import (
                constrain_batch, constrain_batch_axes)
        N_ = self.run_cfg.num_envs

        def make_train_step(act_override):
          def train_step(params, opt_state, sp_state, key, opp_params=None):
            if mesh is not None:
                sp_state = constrain_batch_axes(sp_state, mesh, (N_,))
            if rec_like:
                sp_state, rollout, h0, masks, bootstrap = \
                    collect_rollout_recurrent(
                        params, apply_fn, sp_state, env_cfg_,
                        run_cfg_.num_steps, run_cfg_.init_rand_steps,
                        opp_params=opp_params)
                if mesh is not None:
                    rollout, masks = constrain_batch(
                        (rollout, masks), mesh, axis=1, batch_size=N_)
                    h0, bootstrap = constrain_batch(
                        (h0, bootstrap), mesh, axis=0, batch_size=N_)
                params, opt_state, metrics = ppo_update_recurrent(
                    params, opt_state, rollout, h0, masks, bootstrap,
                    key, apply_fn, optimizer, ppo_cfg_,
                    split_fns=self._split_fns)
            elif time_limited:
                sp, elapsed = sp_state
                sp, elapsed, rollout, bad, bootstrap = \
                    collect_rollout_time_limited(
                        params, apply_fn, sp, elapsed, env_cfg_,
                        run_cfg_.num_steps, run_cfg_.max_episode_plies,
                        run_cfg_.init_rand_steps, opp_params=opp_params)
                if mesh is not None:
                    rollout, bad = constrain_batch(
                        (rollout, bad), mesh, axis=1, batch_size=N_)
                    bootstrap, elapsed = constrain_batch(
                        (bootstrap, elapsed), mesh, axis=0, batch_size=N_)
                params, opt_state, metrics = ppo_update(
                    params, opt_state, rollout, bootstrap, key, apply_fn,
                    optimizer, ppo_cfg_, bad_transition=bad)
                metrics = dict(metrics)
                metrics["truncations"] = bad.sum()
                sp_state = (sp, elapsed)
            else:
                sp_state, rollout, bootstrap = collect_rollout(
                    params, apply_fn, sp_state, env_cfg_,
                    run_cfg_.num_steps, run_cfg_.init_rand_steps,
                    opp_params=opp_params, act_override=act_override)
                if mesh is not None:
                    rollout = constrain_batch(rollout, mesh, axis=1,
                                              batch_size=N_)
                    bootstrap = constrain_batch(bootstrap, mesh, axis=0,
                                                batch_size=N_)
                params, opt_state, metrics = ppo_update(
                    params, opt_state, rollout, bootstrap, key, apply_fn,
                    optimizer, ppo_cfg_)
            metrics = dict(metrics)
            metrics["episode_return"] = (
                rollout.reward.sum() / jnp.maximum(rollout.done.sum(), 1))
            metrics["episodes"] = rollout.done.sum()
            return params, opt_state, sp_state, metrics
          return train_step

        train_step = make_train_step(act_override)
        chain = self.run_cfg.chain_updates
        if chain > 1 and use_pool:
            raise ValueError("chain_updates > 1 is incompatible with "
                             "opponent_pool (snapshots re-draw per "
                             "update on host)")
        mix = self.run_cfg.lookahead_mix
        if self.run_cfg.lookahead_collect and not 0.0 < mix <= 1.0:
            raise ValueError(f"lookahead_mix must be in (0, 1], got {mix}")
        mixed = self.run_cfg.lookahead_collect and mix < 1.0
        if mixed and chain > 1:
            raise ValueError("lookahead_mix < 1 is incompatible with "
                             "chain_updates > 1 (the chain bakes one "
                             "collection mode)")
        if use_pool:
            self._train_step = jax.jit(train_step,
                                       donate_argnums=(0, 1, 2))
        elif chain > 1:
            self._train_step = jax.jit(chain_train_steps(train_step, chain),
                                       donate_argnums=(0, 1, 2))
        else:
            self._train_step = jax.jit(
                lambda p, o, s, k: train_step(p, o, s, k),
                donate_argnums=(0, 1, 2))
        # Mixed collection: a second jitted step whose collector has NO
        # override; _pick_step interleaves the two deterministically.
        self._train_step_plain = None
        self._mix_err = 0.0
        if mixed:
            plain = make_train_step(None)
            self._train_step_plain = jax.jit(
                plain if use_pool else (lambda p, o, s, k:
                                        plain(p, o, s, k)),
                donate_argnums=(0, 1, 2))
        self.pool: list = []
        self._pool_rng = pyrandom.Random(self.run_cfg.seed)
        self.anchors: list = []
        for path in self.run_cfg.pool_anchors:
            err = None
            try:
                _, ap, _, _ = load_checkpoint(path, self.params)
                mismatch = [
                    (jax.tree_util.keystr(kp), jnp.shape(a), b.shape)
                    for (kp, a), b in zip(
                        jax.tree_util.tree_leaves_with_path(ap),
                        jax.tree.leaves(self.params))
                    if jnp.shape(a) != b.shape]
                if mismatch:
                    err = f"shape mismatches {mismatch[:3]}"
            except Exception as e:
                err = repr(e)
            if err is not None:
                raise ValueError(
                    f"pool anchor {path!r} does not match the training "
                    f"net architecture (hidden_size / width_mult / "
                    f"recurrent must agree — the collector applies the "
                    f"training net to the opponent params): {err}")
            self.anchors.append(ap)

        def eval_step(params, key):
            """Win rates vs rand & greedy, policy color randomized by
            splitting games half/half (rule_base_game semantics,
            ppo_run_self_play.py:371-441)."""
            n = run_cfg_.num_test_games // 2
            # Eval uses win/loss only; the eval env's disk rewards don't
            # change the winner, so reuse the training EnvConfig.
            results = {}
            for name, opp in (("rand", random_policy),
                              ("greedy", greedy_policy)):
                key, k1, k2 = jax.random.split(key, 3)
                if rec_like:
                    w_as_black = play_games_recurrent(
                        k1, env_cfg_, params, apply_fn, opp, n, -1,
                        run_cfg_.test_init_rand_steps,
                        self._policy_state_size)
                    w_as_white = play_games_recurrent(
                        k2, env_cfg_, params, apply_fn, opp, n, 1,
                        run_cfg_.test_init_rand_steps,
                        self._policy_state_size)
                else:
                    net_act = net_tournament_policy(params, apply_fn)
                    w_as_black = play_games_impl(
                        k1, env_cfg_, net_act, opp, n,
                        run_cfg_.test_init_rand_steps)
                    w_as_white = play_games_impl(
                        k2, env_cfg_, opp, net_act, n,
                        run_cfg_.test_init_rand_steps)
                wins = ((w_as_black == -1).sum()
                        + (w_as_white == 1).sum())
                results[name] = wins / (2 * n)
            return results

        self._eval_step = jax.jit(eval_step)

    def ensure_initialized(self):
        if self.sp_state is None:
            self.key, k = jax.random.split(self.key)
            kwargs = {}
            if self.mesh is not None:
                from gymothelloenv_tpu.parallel.sharding import (
                    place_replicated)
                self.params, self.opt_state = place_replicated(
                    (self.params, self.opt_state), self.mesh)
            if self.run_cfg.opponent_pool > 0:
                # Keep the pool invariant (the non-learning color is a
                # frozen snapshot or anchor) from the very first
                # opponent ply.
                kwargs["opp_params"] = self._draw_opponent()
            if self._policy_state_size:   # recurrent or frame-stacked
                self.sp_state = jax.jit(
                    selfplay_init_recurrent,
                    static_argnames=("apply_fn", "cfg", "num_envs",
                                     "hidden_size", "init_rand_steps"))(
                    self.params, apply_fn=self.apply_fn, key=k,
                    cfg=self.env_cfg, num_envs=self.run_cfg.num_envs,
                    hidden_size=self._policy_state_size,
                    init_rand_steps=self.run_cfg.init_rand_steps,
                    **kwargs)
            else:
                self.sp_state = jax.jit(
                    selfplay_init, static_argnames=("apply_fn", "cfg",
                                                    "num_envs",
                                                    "init_rand_steps",
                                                    "act_override"))(
                    self.params, apply_fn=self.apply_fn, key=k,
                    cfg=self.env_cfg, num_envs=self.run_cfg.num_envs,
                    init_rand_steps=self.run_cfg.init_rand_steps,
                    act_override=self._act_override,
                    **kwargs)
                if self.run_cfg.max_episode_plies > 0:
                    # The init state's pending decision is ply 1.
                    self.sp_state = (self.sp_state, jnp.ones(
                        (self.run_cfg.num_envs,), jnp.int32))
            if self.mesh is not None:
                from gymothelloenv_tpu.parallel.sharding import (
                    shard_batch_axes)
                self.sp_state = jax.device_put(
                    self.sp_state,
                    shard_batch_axes(self.mesh, self.sp_state,
                                     (self.run_cfg.num_envs,)))

    def _snapshot_params(self):
        return jax.tree.map(lambda x: x.copy(), self.params)

    def _draw_opponent(self):
        """Uniform draw over anchors + snapshot ring (anchors are
        permanent; the ring rotates)."""
        if not self.pool:
            self.pool.append(self._snapshot_params())
        cands = self.anchors + self.pool
        return cands[self._pool_rng.randrange(len(cands))]

    def _pick_step(self):
        """Lookahead-mix interleaving: a Bresenham accumulator yields the
        lookahead-collection step a ``lookahead_mix`` fraction of
        updates and the plain-collection step otherwise (deterministic;
        0.5 alternates strictly)."""
        if getattr(self, "_train_step_plain", None) is None:
            return self._train_step
        self._mix_err += self.run_cfg.lookahead_mix
        if self._mix_err >= 1.0 - 1e-9:
            self._mix_err -= 1.0
            return self._train_step
        return self._train_step_plain

    def _do_update(self, key):
        """One training update — the hook subclasses override to swap the
        algorithm (A2C, ACKTR, GAIL) while reusing the train loop."""
        step = self._pick_step()
        if self.run_cfg.opponent_pool > 0:
            opp = self._draw_opponent()
            self.params, self.opt_state, self.sp_state, metrics = \
                step(self.params, self.opt_state, self.sp_state, key, opp)
            if (self.update_count + 1) % self.run_cfg.pool_interval == 0:
                self.pool.append(self._snapshot_params())
                if len(self.pool) > self.run_cfg.opponent_pool:
                    self.pool.pop(0)
        else:
            self.params, self.opt_state, self.sp_state, metrics = \
                step(self.params, self.opt_state, self.sp_state, key)
        return metrics

    def train(self, num_updates: int, log_every: int = 10,
              checkpoint_path: str = None):
        """``checkpoint_path`` may contain a ``{step}`` placeholder — each
        interval save then lands in its own file (snapshot history for
        post-hoc early stopping, which RESULTS.md shows is the recipe)
        instead of overwriting one path."""
        self.ensure_initialized()
        t0 = time.time()
        steps_done = 0
        chain = max(1, self.run_cfg.chain_updates)

        def crossed(interval):
            return (self.update_count // interval) > \
                ((self.update_count - chain) // interval)

        done_iters = 0
        for u in range(0, num_updates, chain):
            self.key, k = jax.random.split(self.key)
            metrics = self._do_update(k)
            self.update_count += chain
            done_iters += 1
            steps_done += (self.run_cfg.num_steps * self.run_cfg.num_envs
                           * chain)

            if done_iters % log_every == 0 or u + chain >= num_updates:
                metrics = {k_: fetch_scalar(v) for k_, v in metrics.items()}
                dt = time.time() - t0
                metrics["transitions_per_sec"] = steps_done / dt
                self._log(self.update_count, metrics)

            if crossed(self.run_cfg.test_interval):
                self.key, k = jax.random.split(self.key)
                wins = {k_: fetch_scalar(v)
                        for k_, v in self._eval_step(self.params, k).items()}
                self._log(self.update_count,
                          {f"win%({k_})": v for k_, v in wins.items()})

            if checkpoint_path and crossed(self.run_cfg.save_interval):
                self.save(checkpoint_path.format(step=self.update_count))
        if checkpoint_path:
            self.save(checkpoint_path.format(step=self.update_count))

    def evaluate(self):
        self.key, k = jax.random.split(self.key)
        return {k_: fetch_scalar(v)
                for k_, v in self._eval_step(self.params, k).items()}

    def _log(self, step, metrics):
        if self.log_fn:
            self.log_fn(step, metrics)
        else:
            text = " ".join(f"{k}={v:.4g}" for k, v in metrics.items())
            print(f"[update {step}] {text}", flush=True)

    def save(self, path: str):
        save_checkpoint(path, self.update_count, self.params,
                        self.opt_state)

    def load(self, path: str):
        step, self.params, self.opt_state, _ = load_checkpoint(
            path, self.params, self.opt_state)
        self.update_count = step

    def load_params_only(self, path: str):
        """Warm-start: restore PARAMS only, reinitializing the optimizer
        and update counter — for fine-tuning under a different
        schedule/objective (e.g. the search-distillation runs), where
        the stored opt_state's structure/decay position don't apply."""
        _, self.params, _, _ = load_checkpoint(path, self.params)
        self.opt_state = self.optimizer.init(self.params)
        self.update_count = 0
