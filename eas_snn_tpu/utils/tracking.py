"""Experiment tracking: JSONL metrics log + optional TensorBoard.

(reference: yolox/utils/logger.py WandbLogger + tensorboard scalars in
core/trainer.py:292-304 — neither wandb nor tensorboard ships in this
environment, so the always-available backend is a structured JSONL stream
(one {"step", "split", ...} object per line, trivially greppable/plottable);
TensorBoard is used transparently when importable.)
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

__all__ = ["MetricsTracker"]


class MetricsTracker:
    def __init__(self, output_dir: str, enabled: bool = True):
        self.enabled = enabled
        self._f = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(output_dir, exist_ok=True)
        self._f = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
        except Exception:
            self._tb = None

    def log(self, step: int, metrics: Dict[str, float], split: str = "train"):
        if not self.enabled or self._f is None:
            return
        row = {"ts": time.time(), "step": int(step), "split": split}
        row.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(row) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{split}/{k}", float(v), int(step))

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
