"""Logging: file+console logger and running metric meters.

Replaces create_logger (/root/reference/lib/utils/utils.py:36-71) and the
AverageMeter instrumentation scattered through the reference training loop
(lib/core/function.py:56-61)."""

from __future__ import annotations

import logging
import os
import time
from collections import defaultdict
from typing import Dict


def create_logger(cfg, cfg_name: str, phase: str = "train"):
    """File + console logger under OUTPUT_DIR/<dataset>/<cfg>/."""
    root = cfg.OUTPUT_DIR or "output"
    cfg_base = os.path.splitext(os.path.basename(cfg_name))[0]
    out_dir = os.path.join(root, cfg.DATASET.TEST_DATASET, cfg_base)
    os.makedirs(out_dir, exist_ok=True)

    stamp = time.strftime("%Y-%m-%d-%H-%M")
    log_file = os.path.join(out_dir, f"{cfg_base}_{stamp}_{phase}.log")
    logger = logging.getLogger("mvgformer_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = logging.Formatter("%(asctime)-15s %(message)s")
    fh = logging.FileHandler(log_file)
    fh.setFormatter(fmt)
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(fh)
    logger.addHandler(sh)
    return logger, out_dir


class AverageMeter:
    """Running average (the reference's ubiquitous helper)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


class MetricLogger:
    """Dict of AverageMeters with compact formatting."""

    def __init__(self):
        self.meters: Dict[str, AverageMeter] = defaultdict(AverageMeter)

    def update(self, metrics: Dict[str, float], n: int = 1):
        for k, v in metrics.items():
            self.meters[k].update(float(v), n)

    def format(self, keys=None) -> str:
        keys = keys or sorted(self.meters)
        return " ".join(f"{k}={self.meters[k].avg:.4f}" for k in keys
                        if k in self.meters)
