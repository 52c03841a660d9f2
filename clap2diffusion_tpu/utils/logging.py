"""Lightweight metric logging: JSONL + console, honoring the config's
log/save/eval intervals (reference configs/training_config.yaml:65-69 — wandb
and tensorboard are pinned there but never imported; SURVEY.md section 5).
wandb is used when available and enabled, otherwise silently skipped.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricLogger:
    def __init__(self, log_dir: str, run_name: str = "run", use_wandb: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{run_name}.jsonl")
        self._fh = open(self.path, "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(project="clap2diffusion-tpu", name=run_name)
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        rec = {
            "step": int(step),
            "time": round(time.time() - self._t0, 3),
            **{k: float(v) for k, v in metrics.items()},
        }
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()
