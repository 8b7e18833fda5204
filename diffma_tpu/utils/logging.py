"""Experiment logging.

loguru-parity without the dependency: timestamped file+stdout logger on
process 0 only (reference: train.py:77-83), auto-numbered experiment dirs
``NNN-<model-name>`` (train.py:106-110), and a wandb shim that no-ops when
wandb is unavailable (the container has no egress anyway).
"""

from __future__ import annotations

import datetime
import glob
import os
from typing import Optional

__all__ = ["create_logger", "create_experiment_dir", "WandbShim"]


class _Logger:
    def __init__(self, logging_dir: Optional[str], enabled: bool):
        self.enabled = enabled
        self._file = None
        if enabled and logging_dir is not None:
            os.makedirs(logging_dir, exist_ok=True)
            self._file = open(os.path.join(logging_dir, "log_0.txt"), "a")

    def info(self, msg: str) -> None:
        if not self.enabled:
            return
        stamp = datetime.datetime.now().strftime("%Y-%m-%d at %H:%M:%S")
        line = f"{stamp} | INFO | {msg}"
        print(line, flush=True)
        if self._file is not None:
            self._file.write(line + "\n")
            self._file.flush()

    warning = info


def create_logger(logging_dir: Optional[str], rank: int = 0) -> _Logger:
    return _Logger(logging_dir, enabled=(rank == 0))


def create_experiment_dir(results_dir: str, model_name: str) -> str:
    """Auto-numbered ``NNN-<model>`` directory (train.py:106-110)."""
    os.makedirs(results_dir, exist_ok=True)
    index = len(glob.glob(f"{results_dir}/*"))
    name = model_name.replace("/", "-")
    exp_dir = f"{results_dir}/{index:03d}-{name}"
    os.makedirs(os.path.join(exp_dir, "checkpoints"), exist_ok=True)
    return exp_dir


class WandbShim:
    """Real wandb if importable and requested, silent no-op otherwise."""

    def __init__(self, enabled: bool, project: str, config: Optional[dict] = None):
        self._w = None
        if enabled:
            try:
                import wandb

                wandb.init(project=project)
                if config:
                    wandb.config = config
                self._w = wandb
            except Exception:
                pass

    def log(self, data: dict, step: Optional[int] = None) -> None:
        if self._w is not None:
            self._w.log(data, step=step)

    def finish(self) -> None:
        if self._w is not None:
            self._w.finish()
