"""Small LRU sample cache (RAM with optional npz disk spill).

(reference: yolox/utils/cache.py:6-60 — keyed by sample id; used by the
GEN4 raw dataset's frame prestore path, gen4.py:99-120.)
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Optional

import numpy as np

__all__ = ["SampleCache"]


class SampleCache:
    def __init__(self, directory: Optional[str] = None, max_items: int = 200000):
        self.directory = directory
        self.max_items = max_items
        self._ram: "OrderedDict[str, np.ndarray]" = OrderedDict()
        if directory:
            os.makedirs(directory, exist_ok=True)

    def _disk_path(self, key: str) -> Optional[str]:
        if not self.directory:
            return None
        return os.path.join(self.directory, key.replace(os.sep, "_") + ".npz")

    def read(self, key: str) -> Optional[np.ndarray]:
        if key in self._ram:
            self._ram.move_to_end(key)
            return self._ram[key]
        path = self._disk_path(key)
        if path and os.path.exists(path):
            with np.load(path) as z:
                arr = z["arr"]
            self._put_ram(key, arr)
            return arr
        return None

    def write(self, key: str, value: np.ndarray):
        self._put_ram(key, value)
        path = self._disk_path(key)
        if path and not os.path.exists(path):
            np.savez_compressed(path, arr=value)

    def _put_ram(self, key: str, value: np.ndarray):
        self._ram[key] = value
        self._ram.move_to_end(key)
        while len(self._ram) > self.max_items:
            self._ram.popitem(last=False)

    def __len__(self) -> int:
        return len(self._ram)
