"""Dataset concatenation wrappers.

(reference: yolox/data/datasets/datasets_wrapper.py:22-69 ConcatDataset /
MixConcatDataset — torch-free re-derivation over the event-sample contract.
``ConcatDataset`` is a plain index-spliced union; ``MixConcatDataset``
additionally strips the mosaic flag tuple the YoloBatchSampler emits,
rewriting the inner index so mixup sources resolve within the right child.)
"""

from __future__ import annotations

import bisect
from typing import Sequence

import numpy as np

__all__ = ["ConcatDataset", "MixConcatDataset"]


class ConcatDataset:
    def __init__(self, datasets: Sequence):
        assert len(datasets) > 0, "need at least one dataset"
        self.datasets = list(datasets)
        self.cumulative_sizes = list(
            np.cumsum([len(d) for d in self.datasets])
        )
        first = self.datasets[0]
        if hasattr(first, "input_size"):
            self.input_size = first.input_size
        if hasattr(first, "class_names"):
            self.class_names = first.class_names
        self.map_val = bool(getattr(first, "map_val", False))
        # merged sample names so evaluators can resolve ids across children;
        # children may expose sample_names=None (e.g. Mosaic wrappers)
        self.sample_names = []
        for d in self.datasets:
            names = getattr(d, "sample_names", None)
            self.sample_names += (
                list(names) if names is not None else [""] * len(d)
            )

    def __len__(self) -> int:
        return int(self.cumulative_sizes[-1])

    def _resolve(self, idx: int):
        if idx < 0:
            if -idx > len(self):
                raise ValueError("index out of range")
            idx = len(self) + idx
        d = bisect.bisect_right(self.cumulative_sizes, idx)
        s = idx if d == 0 else idx - self.cumulative_sizes[d - 1]
        return d, s

    def __getitem__(self, idx: int):
        d, s = self._resolve(idx)
        sample = self.datasets[d][s]
        return self._reindex(sample, d)

    def _reindex(self, sample, d: int):
        """Children emit sids in their OWN index space; shift into the
        concatenated space so id-keyed consumers don't collide."""
        off = 0 if d == 0 else int(self.cumulative_sizes[d - 1])
        if (
            off and isinstance(sample, tuple) and len(sample) == 4
            and np.isscalar(sample[3])
        ):
            return sample[:3] + (sample[3] + off,)
        return sample

    # propagate trainer hooks to every child
    def close_mosaic(self):
        for d in self.datasets:
            if hasattr(d, "close_mosaic"):
                d.close_mosaic()

    @property
    def training(self):
        return getattr(self.datasets[0], "training", True)

    @training.setter
    def training(self, value):
        for d in self.datasets:
            if hasattr(d, "training"):
                d.training = value


class MixConcatDataset(ConcatDataset):
    """Accepts either a plain int index or a ``(flag, idx, ...)`` tuple
    (reference :44-69): the inner index is rewritten to the child's local
    range before forwarding the full tuple."""

    def __getitem__(self, index):
        if isinstance(index, (int, np.integer)):
            return super().__getitem__(int(index))
        idx = index[1]
        d, s = self._resolve(int(idx))
        new_index = (index[0], s) + tuple(index[2:])
        return self._reindex(self.datasets[d][new_index], d)
