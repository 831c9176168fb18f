"""Metrics logging (rebuilds C21): TensorBoard scalars + JSONL + console.

The JSONL stream (``<work_dir>/metrics.jsonl``) is the machine-readable
per-epoch mIoU/loss output the driver/judge parses (SURVEY §5).  Device
scalars are fetched asynchronously — the trainer only blocks on them at
log-interval boundaries.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Dict, Optional

_LOG = logging.getLogger("sstpu")


def setup_logging(work_dir: Optional[str] = None, level=logging.INFO):
    if _LOG.handlers:
        return _LOG
    _LOG.setLevel(level)
    _LOG.propagate = False
    fmt = logging.Formatter("[%(asctime)s] %(message)s", datefmt="%H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    _LOG.addHandler(sh)
    if work_dir:
        os.makedirs(work_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(work_dir, "train.log"))
        fh.setFormatter(fmt)
        _LOG.addHandler(fh)
    return _LOG


class MetricLogger:
    def __init__(self, work_dir: str, enable_tb: bool = True):
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self._jsonl = open(os.path.join(work_dir, "metrics.jsonl"), "a")
        self._tb = None
        if enable_tb:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
            except Exception:  # pragma: no cover - TB optional
                self._tb = None
        self._t0 = time.time()

    def log_scalars(self, step: int, scalars: Dict[str, float], prefix: str = "train"):
        rec = {"step": step, "time": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps({prefix: rec}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
