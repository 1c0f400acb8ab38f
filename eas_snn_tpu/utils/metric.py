"""Windowed meters for training telemetry.

(reference: yolox/utils/metric.py:65-137 AverageMeter/MeterBuffer; the GPU
memory occupancy helpers have no TPU equivalent worth keeping — HBM usage
comes from jax.local_devices()[0].memory_stats().)
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from typing import Dict, Optional

import numpy as np

__all__ = ["AverageMeter", "MeterBuffer", "hbm_usage_gb"]


class AverageMeter:
    """Tracks a windowed median/average and a global average."""

    def __init__(self, window_size: int = 50):
        self._deque = deque(maxlen=window_size)
        self._total = 0.0
        self._count = 0

    def update(self, value):
        self._deque.append(float(value))
        self._total += float(value)
        self._count += 1

    @property
    def median(self) -> float:
        return float(np.median(self._deque)) if self._deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self._deque)) if self._deque else 0.0

    @property
    def global_avg(self) -> float:
        return self._total / max(self._count, 1)

    @property
    def latest(self) -> float:
        return self._deque[-1] if self._deque else 0.0

    def reset(self):
        self._deque.clear()
        self._total = 0.0
        self._count = 0

    def clear(self):
        self._deque.clear()


class MeterBuffer(defaultdict):
    """Name -> AverageMeter map with bulk update/filter."""

    def __init__(self, window_size: int = 20):
        super().__init__(lambda: AverageMeter(window_size))

    def update(self, values: Optional[Dict] = None, **kwargs):
        values = dict(values or {})
        values.update(kwargs)
        for k, v in values.items():
            self[k].update(v)

    def get_filtered_meter(self, filter_key: str) -> Dict[str, AverageMeter]:
        return {k: v for k, v in self.items() if filter_key in k}

    def reset(self):
        for v in self.values():
            v.reset()

    def clear_meters(self):
        for v in self.values():
            v.clear()


def hbm_usage_gb() -> float:
    """Bytes in use on the first local accelerator, in GiB (0.0 if the
    backend exposes no memory stats)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        return stats.get("bytes_in_use", 0) / 2 ** 30
    except Exception:
        return 0.0
