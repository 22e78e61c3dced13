"""Generate a GAIL expert dataset from a scripted expert.

The reference ships MuJoCo expert trajectories + an h5->pt converter
(gail_experts/convert_to_pytorch.py); for Othello we generate expert data
directly by playing a scripted expert (default maximin-2) against itself
on device and recording (flattened make_state features, action) pairs.
Output: npz with 'states' (K, T, D), 'actions' (K, T), 'lengths' (K,) —
the format agents.gail.ExpertDataset loads.

Usage:
    python scripts/make_expert_dataset.py --games 64 \
        --out data/expert_maximin2.npz
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.featurize import make_state
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.policies import make_policy
from gymothelloenv_tpu.utils.tpu import warmup


def main(argv=None):
    warmup()
    parser = argparse.ArgumentParser()
    parser.add_argument("--games", type=int, default=64)
    parser.add_argument("--expert", type=str, default="maximin")
    parser.add_argument("--search-depth", type=int, default=2)
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--init-rand-steps", type=int, default=10)
    parser.add_argument("--include-openings", action="store_true",
                        help="also record the random-opening plies as "
                             "expert data (the round-2/3 datasets did — "
                             "up to init-rand-steps/game of label noise; "
                             "default now records only the expert's own "
                             "decisions)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, required=True)
    args, _ = parser.parse_known_args(argv)

    cfg = EnvConfig(board_size=args.board_size)
    act = make_policy(args.expert, cfg, search_depth=args.search_depth)
    jact = jax.jit(lambda k, s: act(k, s))
    jstep = jax.jit(core.step, static_argnums=2)
    jfeat = jax.jit(make_state)

    key = jax.random.PRNGKey(args.seed)
    rng = np.random.RandomState(args.seed)
    max_plies = args.board_size ** 2
    D = 4 * args.board_size ** 2
    states = np.zeros((args.games, max_plies, D), np.float32)
    actions = np.zeros((args.games, max_plies), np.int64)
    lengths = np.zeros(args.games, np.int64)

    for g in range(args.games):
        s = core.reset(cfg)
        rand_left = rng.randint(0, args.init_rand_steps // 2 + 1) * 2
        t = 0
        while not bool(s.terminated) and t < max_plies:
            key, k = jax.random.split(key)
            if rand_left > 0:
                moves = np.nonzero(np.asarray(s.legal))[0]
                a = int(moves[rng.randint(len(moves))])
                rand_left -= 1
                record = args.include_openings
            else:
                a = int(jact(k, s))
                record = True
            if record:
                states[g, t] = np.asarray(jfeat(s)).reshape(-1)
                actions[g, t] = a
                t += 1
            s = jstep(s, jnp.int32(a), cfg).state
        lengths[g] = t
        if (g + 1) % 16 == 0:
            print(f"{g + 1}/{args.games} games", flush=True)

    np.savez(args.out, states=states, actions=actions, lengths=lengths)
    print(f"wrote {args.out}: {int(lengths.sum())} transitions "
          f"from {args.games} games")


if __name__ == "__main__":
    main()
