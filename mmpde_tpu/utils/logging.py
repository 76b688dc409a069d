"""Metric logging: JSONL + optional TensorBoard.

The reference logs via prints, a text log list, and TensorBoard scalars
(mmpde.py:21,222,315-317; mesh/dmm.py:124-125).  Here every metric event is
appended to a JSONL file (machine-readable, crash-safe) and mirrored to
TensorBoard when tensorboardX is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class MetricLogger:
    def __init__(self, log_dir: str, name: str = "metrics",
                 tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, **metrics):
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v)
                    for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
