"""Metrics logging — the reference's observability layer rebuilt
(TensorBoard ``SummaryWriter`` + append-only text logs, dqn.py:160/374-387,
ppo.py:157/320-334, ppo_run_self_play.py:97/211-229).

TensorBoard event files are written via ``torch.utils.tensorboard`` when
available (torch is CPU-only here — fine for logging); falls back to JSONL +
console if not.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, log_dir: str, also_print: bool = True):
        self.log_dir = log_dir
        self.also_print = also_print
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def log(self, step: int, metrics: dict) -> None:
        rec = {"step": step, "time": time.time(), **metrics}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass
        if self.also_print:
            text = " ".join(f"{k}={float(v):.4g}" for k, v in metrics.items()
                            if isinstance(v, (int, float)))
            print(f"[step {step}] {text}", flush=True)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
