"""Game replay viewer — renders a full game between two policies as ONE
self-contained HTML file with step/play controls.  Supersedes the
reference's GUI (pyglet board with legal-move hints, othello.py:503-597,
broken in its snapshot): same visual design via the SVG renderer, plus
move annotations and disk counts, no display server or extra deps needed.

Usage:
    python -m gymothelloenv_tpu.cli.replay --black greedy \
        --white maximin-2 --out replay.html
    # net player from a checkpoint (msgpack or reference .pth):
    python -m gymothelloenv_tpu.cli.replay --black net:model.msgpack
"""

from __future__ import annotations

import argparse
import html
import json

import jax
import jax.numpy as jnp
import numpy as np

from gymothelloenv_tpu.core import state as core
from gymothelloenv_tpu.core.state import EnvConfig
from gymothelloenv_tpu.utils.render import board_svg

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>Othello replay</title>
<style>
 body {{ font-family: sans-serif; margin: 24px; }}
 #board svg {{ border: 2px solid #333; }}
 #controls {{ margin: 12px 0; }}
 button {{ font-size: 16px; padding: 4px 14px; margin-right: 6px; }}
 #caption {{ font-size: 15px; margin-top: 8px; white-space: pre; }}
</style></head><body>
<h3>{title}</h3>
<div id="board"></div>
<div id="controls">
 <button onclick="go(0)">&#9198;</button>
 <button onclick="go(i-1)">&#9664;</button>
 <button onclick="toggle()" id="playbtn">&#9654;</button>
 <button onclick="go(i+1)">&#9654;&#9654;</button>
 <button onclick="go(frames.length-1)">&#9197;</button>
 <input type="range" min="0" max="{last}" value="0" id="slider"
        oninput="go(parseInt(this.value))" style="width:300px">
</div>
<div id="caption"></div>
<script>
const frames = {frames_json};
const captions = {captions_json};
let i = 0, timer = null;
function go(j) {{
  i = Math.max(0, Math.min(frames.length - 1, j));
  document.getElementById('board').innerHTML = frames[i];
  document.getElementById('caption').textContent = captions[i];
  document.getElementById('slider').value = i;
}}
function toggle() {{
  if (timer) {{ clearInterval(timer); timer = null;
    document.getElementById('playbtn').innerHTML = '&#9654;'; return; }}
  document.getElementById('playbtn').innerHTML = '&#9208;';
  timer = setInterval(() => {{
    if (i >= frames.length - 1) {{ toggle(); return; }}
    go(i + 1);
  }}, 700);
}}
document.addEventListener('keydown', e => {{
  if (e.key === 'ArrowRight') go(i + 1);
  if (e.key === 'ArrowLeft') go(i - 1);
}});
go(0);
</script></body></html>
"""


def _net_policy(path: str, cfg: EnvConfig):
    """Policy from a checkpoint: .msgpack (this framework; capacity knobs
    inferred from stored shapes) or a reference torch .pth/.pt
    (architecture auto-detected).  Recurrent (GRU) checkpoints thread a
    host-held hidden state across this replay's single game (the jitted
    part is the forward; the carry lives in a closure cell, so the
    policy must NOT be re-jitted — flagged via ``.prejitted``)."""
    from gymothelloenv_tpu.core.featurize import make_state
    from gymothelloenv_tpu.models.distributions import MaskedCategorical
    from gymothelloenv_tpu.train.ppo_trainer import (load_eval_policy,
                                                     net_tournament_policy)
    params, apply_fn, _ = load_eval_policy(path, cfg)
    if not getattr(apply_fn, "recurrent", False):
        return net_tournament_policy(params, apply_fn)

    import jax.numpy as jnp
    fwd = jax.jit(
        lambda p, x, h: apply_fn(p, x, h, jnp.ones((1,)))[::2])
    sample = jax.jit(lambda lg, legal, k: MaskedCategorical(
        logits=lg, mask=legal).sample(k))
    cell = [jnp.zeros((1, apply_fn.hidden_size))]

    def act(key, state):
        logits, cell[0] = fwd(params, make_state(state)[None], cell[0])
        return sample(logits[0], state.legal, key)

    act.prejitted = True
    return act


def _policy(spec: str, cfg: EnvConfig):
    if spec.startswith("net:"):
        pol = _net_policy(spec[4:], cfg)
    else:
        from gymothelloenv_tpu.cli.tournament import policy_from_spec
        pol = policy_from_spec(spec, cfg)
    # Per-move dispatch is host-driven here; eager policy code is
    # pathologically slow through the TPU tunnel — always jit (except
    # stateful recurrent policies, which jit their inner pieces).
    if getattr(pol, "prejitted", False):
        return pol
    return jax.jit(pol)


def play_one_game(cfg: EnvConfig, black, white, key, init_rand_steps: int):
    """Returns a list of (board np, legal indices, turn, caption) frames
    incl. the terminal position."""
    from gymothelloenv_tpu.policies.scripted import random_action
    from gymothelloenv_tpu.train.tournament import draw_max_rand_steps
    jstep = jax.jit(core.step, static_argnums=2)
    jrand = jax.jit(random_action)
    B = cfg.board_size
    s = core.reset(cfg)
    key, k_rand = jax.random.split(key)
    rand_left = int(draw_max_rand_steps(k_rand, init_rand_steps))

    frames = []
    ply = 0
    while not bool(s.terminated) and ply < B ** 2 + 10:
        key, k = jax.random.split(key)
        if ply < rand_left:
            # Stateful (recurrent) policies still see the overridden
            # decision so their hidden advances through the opening —
            # the same semantics play_games_recurrent uses in
            # training/eval; the stateless policies' result is unused.
            pol = black if int(s.turn) == -1 else white
            if getattr(pol, "prejitted", False):
                key, k_pol = jax.random.split(key)
                pol(k_pol, s)
            a = jrand(k, s.legal)
            who = "random opening"
        else:
            pol = black if int(s.turn) == -1 else white
            a = pol(k, s)
            who = "black" if int(s.turn) == -1 else "white"
        board = np.asarray(s.board)
        legal = np.nonzero(np.asarray(s.legal))[0].tolist()
        mover = "BLACK" if int(s.turn) == -1 else "WHITE"
        a_int = int(a)
        frames.append((board, legal, int(s.turn),
                       f"ply {ply}: {mover} to move ({who}) -> "
                       f"{chr(97 + a_int % B)}{a_int // B + 1} "
                       f"(action {a_int})"))
        s = jstep(s, jnp.int32(a_int), cfg).state
        ply += 1

    board = np.asarray(s.board)
    blacks = int((board == -1).sum())
    whites = int((board == 1).sum())
    winner = {-1: "BLACK wins", 0: "draw", 1: "WHITE wins"}[int(s.winner)]
    frames.append((board, [], int(s.turn),
                   f"final: {winner}  (black {blacks} - white {whites})"))
    return frames


def main(argv=None):
    from gymothelloenv_tpu.utils.tpu import warmup
    warmup()
    parser = argparse.ArgumentParser()
    parser.add_argument("--black", type=str, default="greedy",
                        help="rand | greedy | maximin-<k> | net:<ckpt>")
    parser.add_argument("--white", type=str, default="rand")
    parser.add_argument("--board-size", type=int, default=8)
    parser.add_argument("--init-rand-steps", type=int, default=0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=str, default="replay.html")
    args, _ = parser.parse_known_args(argv)

    cfg = EnvConfig(board_size=args.board_size)
    black = _policy(args.black, cfg)
    white = _policy(args.white, cfg)
    frames = play_one_game(cfg, black, white,
                           jax.random.PRNGKey(args.seed),
                           args.init_rand_steps)

    svgs = [board_svg(b, legal_actions=legal, player_turn=t)
            for b, legal, t, _ in frames]
    captions = [c for _, _, _, c in frames]
    page = _PAGE.format(
        title=html.escape(
            f"{args.black} (black) vs {args.white} (white) — "
            f"seed {args.seed}"),
        last=len(frames) - 1,
        frames_json=json.dumps(svgs),
        captions_json=json.dumps(captions))
    with open(args.out, "w") as f:
        f.write(page)
    print(f"wrote {args.out}: {len(frames)} frames; {captions[-1]}")


if __name__ == "__main__":
    main()
