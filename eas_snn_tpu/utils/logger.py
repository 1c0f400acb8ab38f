"""Rank-aware logging on stdlib logging (the environment has no loguru).

(reference: yolox/utils/logger.py:82-114 setup_logger — rank-0 console +
per-rank file; the stdout-capture shim for third-party prints is
unnecessary here because our mAP engine prints nothing.)
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Optional

__all__ = ["setup_logger", "get_logger"]

_FMT = "%(asctime)s | %(levelname)s | %(name)s:%(lineno)d - %(message)s"


def setup_logger(
    output_dir: Optional[str] = None,
    rank: int = 0,
    filename: str = "train_log.txt",
    mode: str = "a",
) -> logging.Logger:
    logger = logging.getLogger("eas_snn_tpu")
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    logger.propagate = False
    if rank == 0:
        sh = logging.StreamHandler(sys.stderr)
        sh.setFormatter(logging.Formatter(_FMT, datefmt="%H:%M:%S"))
        logger.addHandler(sh)
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        name, ext = os.path.splitext(filename)
        path = os.path.join(
            output_dir, filename if rank == 0 else f"{name}_rank{rank}{ext}"
        )
        fh = logging.FileHandler(path, mode=mode)
        fh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(fh)
    return logger


def get_logger() -> logging.Logger:
    return logging.getLogger("eas_snn_tpu")
