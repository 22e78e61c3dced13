"""Divergence hunt: compare OUR maximin decisions against the REFERENCE
MaxiMinPolicy on randomly sampled midgame positions.

Generates positions by seeded random playouts of the reference env, then
for each (board, turn) runs both implementations at the given depth and
reports any position where the chosen action differs.

Usage:
    env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        python scripts/maximin_oracle_hunt.py --depth 3 --positions 120
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests", "golden"))
from generate_golden import install_shims  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--depth", type=int, default=3)
    parser.add_argument("--positions", type=int, default=120)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    install_shims()
    sys.path.insert(0, "/root/reference")
    import contextlib
    import othello           # noqa: E402
    import simple_policies   # noqa: E402

    import jax
    import jax.numpy as jnp
    from gymothelloenv_tpu.core.state import EnvConfig, OthelloState
    from gymothelloenv_tpu.core.state import legal_actions
    from gymothelloenv_tpu.policies import maximin_action

    cfg = EnvConfig()
    ours = jax.jit(lambda s: maximin_action(s, cfg, args.depth))

    rnd = np.random.RandomState(args.seed)
    devnull = open(os.devnull, "w")
    mismatches = 0
    checked = 0
    with contextlib.redirect_stdout(devnull):
        ref_env = othello.OthelloBaseEnv(board_size=8, mute=True)
        ref_pol = simple_policies.MaxiMinPolicy(args.depth)
    while checked < args.positions:
        # Random playout to a random depth, sample the position there.
        with contextlib.redirect_stdout(devnull):
            env = othello.OthelloBaseEnv(board_size=8, mute=True)
            env.reset()
            target_ply = rnd.randint(0, 55)
            for _ in range(target_ply):
                moves = list(env.possible_moves)
                if env.terminated or not moves:
                    break
                env.step(moves[rnd.randint(len(moves))])
            if env.terminated or not list(env.possible_moves):
                continue
            board = np.array(env.board_state, dtype=np.int8)
            turn = int(env.player_turn)

            ref_pol.reset(env)
            ref_action = int(ref_pol.get_action(None))

        s = OthelloState(
            board=jnp.asarray(board),
            turn=jnp.int8(turn),
            legal=legal_actions(jnp.asarray(board), jnp.int8(turn)),
            terminated=jnp.bool_(False),
            winner=jnp.int8(0))
        our_action = int(ours(s))
        checked += 1
        if our_action != ref_action:
            mismatches += 1
            print(f"MISMATCH at position {checked} (ply {target_ply}, "
                  f"turn {turn}): ours={our_action} ref={ref_action}")
            print(board)
        if checked % 20 == 0:
            print(f"checked {checked}, mismatches {mismatches}",
                  file=sys.stderr, flush=True)
    print(f"done: {checked} positions, {mismatches} mismatches")


if __name__ == "__main__":
    main()
