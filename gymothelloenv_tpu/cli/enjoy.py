"""Interactive rollout of a saved agent — rebuild of the vendored
``enjoy.py`` (:39-95): load a checkpoint and watch it play (or play
against it as a human).

Usage:
    python -m gymothelloenv_tpu.cli.enjoy --load data/selfplay/ppo.msgpack
    python -m gymothelloenv_tpu.cli.enjoy --load ... --opponent human
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.compat import (GreedyPolicy, HumanPolicy,
                                      MaxiMinPolicy, RandomPolicy,
                                      SimpleOthelloEnv)
from gymothelloenv_tpu.compat.featurize import make_state4
from gymothelloenv_tpu.models.distributions import MaskedCategorical
from gymothelloenv_tpu.core.state import EnvConfig


def main(argv=None):
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()   # absorb the axon tunnel init before queuing big programs
    parser = argparse.ArgumentParser()
    parser.add_argument("--load", type=str, required=True,
                        help="PolicyNet checkpoint (msgpack)")
    parser.add_argument("--opponent", type=str, default="greedy",
                        choices=["rand", "greedy", "maximin", "human"])
    parser.add_argument("--opponent-search-depth", type=int, default=2)
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--episodes", type=int, default=1)
    parser.add_argument("--agent-plays-white", action="store_true")
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--live-html", type=str, default="",
                        help="write a self-refreshing HTML board view to "
                             "this path after every move (open it in a "
                             "browser) — the live render loop the "
                             "reference's broken pyglet window was for")
    parser.add_argument("--move-delay", type=float, default=0.0,
                        help="seconds to sleep between moves (watchable "
                             "pacing for --live-html)")
    args, _ = parser.parse_known_args(argv)

    cfg = EnvConfig(board_size=args.board_size)
    from gymothelloenv_tpu.train.ppo_trainer import load_eval_policy
    params, apply_fn, desc = load_eval_policy(args.load, cfg)
    print(f"loaded {args.load} ({desc})")
    recurrent = getattr(apply_fn, "recurrent", False)
    if recurrent:
        # GRU checkpoint: thread the hidden state across the agent's
        # decisions (reset per episode), like the training collector.
        forward_rec = jax.jit(
            lambda p, x, h: apply_fn(p, x, h, jnp.ones((1,)))[::2])
        h_state = jnp.zeros((1, apply_fn.hidden_size))
    else:
        forward = jax.jit(lambda p, x: apply_fn(p, x)[0])

    if args.opponent == "rand":
        opp = RandomPolicy(seed=args.seed)
    elif args.opponent == "greedy":
        opp = GreedyPolicy()
    elif args.opponent == "maximin":
        opp = MaxiMinPolicy(args.opponent_search_depth)
    else:
        opp = HumanPolicy(args.board_size)

    env = SimpleOthelloEnv(board_size=args.board_size, seed=args.seed)
    agent_color = 1 if args.agent_plays_white else -1
    key = jax.random.PRNGKey(args.seed)
    rng = np.random.RandomState(args.seed)

    log: list = []

    def render_live(done=False, final=False, extra=""):
        # ``done`` shows the episode's game-over page; only ``final``
        # (last episode) drops the <meta refresh> tag so the browser
        # stops polling — an episode-end page mid-run must keep
        # refreshing or episodes 2..N would play invisibly.
        if not args.live_html:
            return
        from gymothelloenv_tpu.utils.render import save_live_html
        lines = ([extra] if extra else []) + log[-12:][::-1]
        save_live_html(args.live_html, env.env.board_state,
                       env.possible_moves if not done else (),
                       env.player_turn, lines, done=done,
                       keep_refreshing=not final)
        if args.move_delay:
            import time as _time
            _time.sleep(args.move_delay)

    if args.live_html:
        print(f"live board view: open {args.live_html} in a browser")

    for ep in range(args.episodes):
        env.reset()
        opp.reset(env)
        done = False
        if recurrent:
            h_state = jnp.zeros_like(h_state)
        render_live()
        while not done:
            env.render(mode="np_array")
            if env.player_turn == agent_color:
                obs = jnp.asarray(make_state4(env))[None]
                if recurrent:
                    logits, h_state = forward_rec(params, obs, h_state)
                    logits = np.asarray(logits[0])
                else:
                    logits = np.asarray(forward(params, obs)[0])
                moves = env.possible_moves
                mask = np.zeros(cfg.num_actions, bool)
                mask[moves] = True
                dist = MaskedCategorical(logits=jnp.asarray(logits),
                                         mask=jnp.asarray(mask))
                if args.deterministic:
                    action = int(dist.mode())
                else:
                    key, k = jax.random.split(key)
                    action = int(dist.sample(k))
                print(f"agent plays {action}")
            else:
                action = int(opp.get_action(env.env.get_observation()))
                print(f"{args.opponent} plays {action}")
            mover = ("agent" if env.player_turn == agent_color
                     else args.opponent)
            _, reward, done, _ = env.step(action)
            log.append(f"{mover} plays {action}")
            # Never final here: the reward caption is written by the
            # post-loop call below — if this page stopped refreshing the
            # browser could fetch it during --move-delay and never see
            # the caption (advisor finding, round 2).
            render_live(done=done)
        env.render(mode="np_array")
        outcome = reward if env.player_turn == agent_color else -reward
        print(f"episode {ep + 1}: agent reward {outcome}")
        render_live(done=True, final=ep == args.episodes - 1,
                    extra=f"episode {ep + 1}: agent reward {outcome}")


if __name__ == "__main__":
    main()
