"""Run logging: stdout tee, scalar/image logging, config fingerprinting.

Rewrite of ``code/Logger.py``: ``TeeLogger`` mirrors stdout to ``log.txt``;
``MetricsLogger`` writes TensorBoard event files when a writer backend is
available (tensorboardX / torch.utils.tensorboard) and always appends a
JSONL metrics stream (machine-readable, multi-host-safe: only process 0
writes).  Checkpoint helpers live in ``training/checkpoints.py``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Optional


def check_directory(filename: str):
    d = os.path.dirname(filename)
    if d and not os.path.exists(d):
        os.makedirs(d, exist_ok=True)


class TeeLogger:
    """Mirror stdout to a log file (ref Logger.py:18-46)."""

    def __init__(self, filename: str):
        check_directory(filename)
        self.terminal = sys.stdout
        self.file = open(filename, "a")
        sys.stdout = self

    def write(self, msg):
        self.terminal.write(msg)
        self.file.write(msg)

    def flush(self):
        self.terminal.flush()
        self.file.flush()

    def close(self):
        sys.stdout = self.terminal
        self.file.close()


def _tb_writer(logdir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(logdir)
    except Exception:
        return None


class MetricsLogger:
    def __init__(self, logdir: str, is_main_process: bool = True):
        self.logdir = logdir
        self.is_main = is_main_process
        self.writer = None
        self.jsonl = None
        if self.is_main:
            os.makedirs(logdir, exist_ok=True)
            self.writer = _tb_writer(logdir)
            self.jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int):
        if not self.is_main:
            return
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)
        self.jsonl.write(
            json.dumps({"tag": tag, "value": float(value), "step": int(step), "t": time.time()})
            + "\n"
        )
        self.jsonl.flush()

    def image(self, tag: str, img, step: int):
        """:param img: [H,W,3] uint8 / float array"""
        if not self.is_main or self.writer is None:
            return
        self.writer.add_image(tag, img, step, dataformats="HWC")

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self.jsonl is not None:
            self.jsonl.close()


def git_revision(repo_dir: Optional[str] = None) -> str:
    """Record the code revision in run logs (ref Logger.py:128-137)."""
    try:
        return (
            subprocess.check_output(
                ["git", "rev-parse", "HEAD"], cwd=repo_dir, stderr=subprocess.DEVNULL
            )
            .decode()
            .strip()
        )
    except Exception:
        return "unknown"


def config_fingerprint(cfg) -> str:
    """Compact run-name fingerprint from a TrackerConfig (the reference packs
    the config into the log-dir name, train.py:240-264)."""
    parts = [
        cfg.encoder_name,
        cfg.mest_type,
        cfg.solver_type,
        f"uCh_{cfg.uncertainty_channel}",
        cfg.uncertainty_type,
        f"rmT_{cfg.remove_tru_sigma}",
        f"fCh_{cfg.feature_channel}",
        cfg.feature_extract,
        f"iP_{cfg.init_pose_type}",
        f"mH_{cfg.multi_hypo}",
        f"wICP_{cfg.combine_icp}",
    ]
    return "_".join(str(p) for p in parts)
