"""Aux-surface tests: SVG renderer, MetricsLogger, visualize CLI, enjoy CLI
(the observability/rendering layer of SURVEY.md §5 that had no direct
coverage)."""

import contextlib
import io
import json
import os

import numpy as np

from gymothelloenv_tpu.utils.logging import MetricsLogger
from gymothelloenv_tpu.utils.render import board_svg, save_board_svg


def _start_board(B=8):
    board = np.zeros((B, B), np.int8)
    h = B // 2
    board[h - 1, h - 1] = board[h, h] = 1       # white
    board[h - 1, h] = board[h, h - 1] = -1      # black
    return board


def test_board_svg_contents():
    svg = board_svg(_start_board(), legal_actions=(19, 26, 37, 44),
                    player_turn=-1)
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    # 2 white + 2 black filled disks, 4 dashed hints.
    assert svg.count('fill="white"') == 2
    assert svg.count('fill="black"') >= 2
    assert svg.count("stroke-dasharray") == 4
    for a in (19, 26, 37, 44):   # hint labels carry the action index
        assert f">{a}</text>" in svg


def test_save_board_svg(tmp_path):
    path = str(tmp_path / "b.svg")
    save_board_svg(path, _start_board(4), legal_actions=(1,),
                   player_turn=1)
    with open(path) as f:
        content = f.read()
    assert "<svg" in content and 'stroke="white"' in content


def test_metrics_logger_jsonl_and_print(tmp_path):
    d = str(tmp_path / "run")
    logger = MetricsLogger(d, also_print=True)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        logger.log(5, {"loss": 1.5, "note": "text-skipped-in-print"})
        logger.log(10, {"loss": 0.5})
    logger.close()
    lines = [json.loads(line) for line in
             open(os.path.join(d, "metrics.jsonl"))]
    assert [rec["step"] for rec in lines] == [5, 10]
    assert lines[0]["loss"] == 1.5 and lines[0]["note"].startswith("text")
    assert "loss=1.5" in buf.getvalue()


def test_visualize_cli_renders_png(tmp_path):
    from gymothelloenv_tpu.cli import visualize

    runs = []
    for seed in (0, 1):
        d = str(tmp_path / f"run{seed}")
        logger = MetricsLogger(d, also_print=False)
        for step in range(0, 50, 10):
            logger.log(step, {"loss": 1.0 / (step + 1 + seed),
                              "win%(rand)": 0.5 + 0.005 * step})
        logger.close()
        runs.append(d)

    out = str(tmp_path / "curves.png")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        visualize.main(runs + ["--out", out])
    assert os.path.exists(out) and os.path.getsize(out) > 1000
    # Metric filter + missing-metric warning path.
    out2 = str(tmp_path / "one.png")
    err = io.StringIO()
    with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(err):
        visualize.main(runs + ["--metrics", "loss", "nope",
                               "--out", out2])
    assert os.path.exists(out2)
    assert "absent" in err.getvalue()


def test_visualize_load_run_and_smooth(tmp_path):
    from gymothelloenv_tpu.cli.visualize import load_run, smooth

    d = str(tmp_path / "r")
    logger = MetricsLogger(d, also_print=False)
    logger.log(1, {"a": 2.0})
    logger.log(3, {"a": 4.0, "b": 1.0})
    logger.close()
    series = load_run(d)
    assert series["a"] == ([1, 3], [2.0, 4.0])
    assert series["b"] == ([3], [1.0])
    sm = smooth([0.0, 10.0, 10.0, 10.0], 0.5)
    assert sm[0] == 0.0 and sm[-1] < 10.0 and sm[-1] > sm[1]
    assert smooth([1.0, 2.0], 0.5) == [1.0, 2.0]  # too short: passthrough


def test_enjoy_cli_plays_an_episode(tmp_path):
    import jax
    from gymothelloenv_tpu.agents.ppo import PPOConfig
    from gymothelloenv_tpu.cli.enjoy import main as enjoy_main
    from gymothelloenv_tpu.core.state import EnvConfig
    from gymothelloenv_tpu.train.ppo_trainer import (PPOSelfPlayTrainer,
                                                     SelfPlayConfig)

    trainer = PPOSelfPlayTrainer(
        env_cfg=EnvConfig(num_disk_as_reward=True),
        ppo_cfg=PPOConfig(num_updates=1),
        run_cfg=SelfPlayConfig(num_envs=8, num_steps=4,
                               test_interval=10_000,
                               save_interval=10_000),
        log_fn=lambda step, m: None)
    trainer.ensure_initialized()
    path = str(tmp_path / "agent.msgpack")
    trainer.save(path)

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        enjoy_main(["--load", path, "--opponent", "rand",
                    "--episodes", "1", "--seed", "3"])
    out = buf.getvalue()
    assert "agent plays" in out and "rand plays" in out
    assert "episode 1: agent reward" in out
    # The ASCII board rendered at least at start and end.
    assert out.count("W") + out.count("B") > 4


def test_live_html_refresh_semantics():
    import numpy as np

    from gymothelloenv_tpu.utils.render import live_html

    board = np.zeros((8, 8), int)
    board[3, 3] = 1
    live = live_html(board, legal_actions=[19], player_turn=-1,
                     status_lines=["black plays 19"])
    assert 'http-equiv="refresh"' in live
    assert "black to move" in live and "black plays 19" in live
    over = live_html(board, done=True)
    assert "refresh" not in over and "game over" in over


def _load_script(name):
    import importlib.util
    import pathlib
    path = pathlib.Path(__file__).resolve().parents[1] / "scripts" / name
    spec = importlib.util.spec_from_file_location(name[:-3], path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tournament_ci_parses_both_log_formats(tmp_path, monkeypatch):
    """The CI comparator must keep parsing cli/tournament's per-pair lines
    AND scripts/tournament_big.py's chunked variant (with the trailing
    [time] field) — the n=1000 run's log flows through it verbatim."""
    tci = _load_script("tournament_ci.py")
    log = (
        "      rand (B) vs greedy     (W):   380 /  10 /  610\n"
        " maximin-3 (B) vs maximin-2 (W):   630 /  20 /  350   [ 42.17s]\n"
        "noise line that should be ignored\n"
    )
    cells = {}
    for m in tci.LINE.finditer(log):
        b, w = m.group(1), m.group(2)
        cells[(b, w)] = tuple(int(x) for x in m.group(3, 4, 5))
    assert cells == {("rand", "greedy"): (380, 10, 610),
                     ("maximin-3", "maximin-2"): (630, 20, 350)}

    # Wilson interval sanity: contains p_hat, shrinks with n, stays in [0,1].
    lo, hi = tci.wilson(0.38, 1000)
    assert 0.0 <= lo < 0.38 < hi <= 1.0
    lo2, hi2 = tci.wilson(0.38, 100)
    assert hi2 - lo2 > hi - lo

    # End-to-end main(): a log agreeing with the README at n=1000 reports
    # every parsed cell as consistent.
    f = tmp_path / "t.log"
    f.write_text(log)
    monkeypatch.setattr("sys.argv", ["tournament_ci.py", str(f)])
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        tci.main()
    text = out.getvalue()
    assert "2 cells consistent with README" in text
    assert "***" not in text


def test_tournament_ci_flags_inconsistent_cell(tmp_path, monkeypatch):
    tci = _load_script("tournament_ci.py")
    f = tmp_path / "t.log"
    # README has rand-vs-greedy at .38 black-win; 600/1000 is a z>>1.96 miss.
    f.write_text("rand (B) vs greedy (W): 600 / 10 / 390\n")
    monkeypatch.setattr("sys.argv", ["tournament_ci.py", str(f)])
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        tci.main()
    assert "1 outside" in out.getvalue()
    assert "***" in out.getvalue()
