"""Seed-sweep launcher (cli/sweep.py) — command construction and the
script/yaml artifact formats (generate_tmux_yaml.py capability parity)."""

import os
import shlex

from gymothelloenv_tpu.cli.sweep import SETTLE_SECONDS, build_commands, main


def test_build_commands_seeds_and_logdirs():
    cmds = build_commands("ppo_self_play", 3, 5, "/tmp/out",
                          ["--num-updates", "7"])
    assert len(cmds) == 3
    for i, cmd in enumerate(cmds):
        seed = 5 + i
        assert "gymothelloenv_tpu.cli.ppo_self_play" in cmd
        assert cmd[cmd.index("--seed") + 1] == str(seed)
        assert cmd[cmd.index("--log-dir") + 1] == (
            f"/tmp/out/ppo_self_play-{seed}")
        assert cmd[-2:] == ["--num-updates", "7"]


def test_script_format(tmp_path, monkeypatch):
    monkeypatch.setenv("PYTHONPATH", "/root/repo")
    out = tmp_path / "sweep"
    main(["--trainer", "dqn_train", "--num-seeds", "2",
          "--out-dir", str(out), "--", "--board-size", "6"])
    script = (out / "run_all.sh").read_text()
    assert script.startswith("#!/bin/sh")
    # The launcher freezes PYTHONPATH so the script survives fresh shells.
    assert "export PYTHONPATH=/root/repo" in script
    assert script.count("gymothelloenv_tpu.cli.dqn_train") == 2
    assert f"sleep {SETTLE_SECONDS}" in script
    assert "--board-size 6" in script
    assert os.access(out / "run_all.sh", os.X_OK)


def test_yaml_format(tmp_path):
    import yaml
    out = tmp_path / "sweep"
    main(["--trainer", "a2c_train", "--num-seeds", "2", "--base-seed", "3",
          "--format", "yaml", "--out-dir", str(out)])
    config = yaml.safe_load((out / "run_all.yaml").read_text())
    assert config["session_name"] == "sweep-a2c_train"
    assert [w["window_name"] for w in config["windows"]] == [
        "seed-3", "seed-4"]
    pane = config["windows"][0]["panes"][0]
    assert "--seed 3" in pane
    assert shlex.split(pane)[1:3] == ["-m", "gymothelloenv_tpu.cli.a2c_train"]
