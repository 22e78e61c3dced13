"""Seed-sweep experiment launcher — the TPU-native rebuild of the
reference's tmuxp generator (pytorch_a2c_ppo_acktr_gail/generate_tmux_yaml.py
+ run_all.yaml), which formats ``main.py`` command lines for N seeds and
dumps them into a tmux session YAML.

Here the swept unit is one of this package's trainer CLIs, and the output
is one of:
  * ``--format script`` (default): a shell script that runs the sweep
    sequentially with a settle pause between runs (back-to-back TPU
    processes through the tunnel can wedge — see utils/tpu.py);
  * ``--format yaml``: a tmuxp-style session file (window per seed), the
    reference's exact artifact shape, for multi-pane CPU or multi-host use;
  * ``--format run``: execute the sweep sequentially in-process.

Each run gets ``--seed <s>`` and ``--log-dir <out>/<name>-<s>`` so
``cli.visualize`` can aggregate the resulting JSONL curves across seeds
(the role visualize.ipynb plays in the reference).

Usage:
    python -m gymothelloenv_tpu.cli.sweep --trainer ppo_self_play \
        --num-seeds 4 --out-dir data/sweeps/ppo -- --num-updates 2000
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys
import time

TRAINERS = ("ppo_self_play", "dqn_train", "rainbow_train", "a2c_train",
            "acktr_train", "gail_train", "run_self_play",
            "teacher_vs_student")

SETTLE_SECONDS = 90


def build_commands(trainer: str, num_seeds: int, base_seed: int,
                   out_dir: str, extra: list[str]) -> list[list[str]]:
    cmds = []
    for i in range(num_seeds):
        seed = base_seed + i
        log_dir = os.path.join(out_dir, f"{trainer}-{seed}")
        cmds.append([sys.executable, "-m",
                     f"gymothelloenv_tpu.cli.{trainer}",
                     "--seed", str(seed), "--log-dir", log_dir] + extra)
    return cmds


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--trainer", choices=TRAINERS,
                        default="ppo_self_play")
    parser.add_argument("--num-seeds", type=int, default=4)
    parser.add_argument("--base-seed", type=int, default=0)
    parser.add_argument("--out-dir", type=str, default="data/sweeps")
    parser.add_argument("--format", choices=("script", "yaml", "run"),
                        default="script")
    parser.add_argument("--output", type=str, default="",
                        help="script/yaml destination "
                             "(default <out-dir>/run_all.{sh,yaml})")
    argv = list(sys.argv[1:] if argv is None else argv)
    extra: list[str] = []
    if "--" in argv:
        split = argv.index("--")
        argv, extra = argv[:split], argv[split + 1:]
    args = parser.parse_args(argv)

    cmds = build_commands(args.trainer, args.num_seeds, args.base_seed,
                          args.out_dir, extra)
    os.makedirs(args.out_dir, exist_ok=True)

    if args.format == "script":
        path = args.output or os.path.join(args.out_dir, "run_all.sh")
        lines = ["#!/bin/sh", "set -e"]
        # Freeze the launching environment's import path so the script
        # works from a fresh shell / nohup (the package is usually run
        # via PYTHONPATH, not installed).
        pythonpath = os.environ.get("PYTHONPATH")
        if pythonpath:
            lines.append(f"export PYTHONPATH={shlex.quote(pythonpath)}")
        for i, cmd in enumerate(cmds):
            if i:
                lines.append(f"sleep {SETTLE_SECONDS}  # TPU-tunnel settle")
            lines.append(shlex.join(cmd))
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.chmod(path, 0o755)
        print(f"wrote {path} ({len(cmds)} runs)")
    elif args.format == "yaml":
        import yaml
        config = {"session_name": f"sweep-{args.trainer}", "windows": []}
        for i, cmd in enumerate(cmds):
            config["windows"].append({
                "window_name": f"seed-{args.base_seed + i}",
                "panes": [shlex.join(cmd)],
            })
        path = args.output or os.path.join(args.out_dir, "run_all.yaml")
        with open(path, "w") as f:
            yaml.dump(config, f, default_flow_style=False)
        print(f"wrote {path} ({len(cmds)} runs)")
    else:
        for i, cmd in enumerate(cmds):
            if i:
                time.sleep(SETTLE_SECONDS)
            print(f"[sweep {i + 1}/{len(cmds)}] {shlex.join(cmd)}",
                  flush=True)
            subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
