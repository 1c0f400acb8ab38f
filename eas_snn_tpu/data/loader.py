"""Samplers and the batched event data loader.

Replaces the reference's torch DataLoader stack (reference:
yolox/data/samplers.py:30-85 InfiniteSampler, dataloading.py:32-113,
data_prefetcher.py:8-52) with a dependency-free pipeline:

  * ``InfiniteSampler`` — seeded infinite shuffled index stream, strided by
    (process_index, process_count) for multi-host DP (the reference strides
    by DDP rank, samplers.py:69-73);
  * ``EventDataLoader`` — thread-pool workers decode/augment samples ahead
    of time into a bounded prefetch queue (the host-side analogue of the
    CUDA-stream DataPrefetcher; on TPU the transfer overlap comes from
    ``jax.device_put`` on the next batch while the current step runs);
  * train collate stacks frames to (B, Tl, Tm, H, W, C) float32 and labels
    to (B, max_labels, 5); eval collate keeps per-image box lists
    (reference gen1_collact_func: gen1.py:524-528).
"""

from __future__ import annotations

import itertools
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence

import numpy as np

__all__ = ["InfiniteSampler", "SequentialSampler", "collate_event_batch", "EventDataLoader"]


class InfiniteSampler:
    """Infinite shuffled (or sequential) index stream, rank-strided."""

    def __init__(
        self,
        size: int,
        shuffle: bool = True,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
    ):
        assert size > 0
        self.size = size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world_size = world_size

    def __iter__(self) -> Iterator[int]:
        return itertools.islice(
            self._infinite(), self.rank, None, self.world_size
        )

    def _infinite(self) -> Iterator[int]:
        rng = np.random.default_rng(self.seed)
        while True:
            if self.shuffle:
                yield from rng.permutation(self.size)
            else:
                yield from range(self.size)


class SequentialSampler:
    """One pass over [0, size), rank-strided WITHOUT padding.

    The reference uses torch's DistributedSampler (which pads with duplicate
    samples, exp/event_yolox_base.py:489-495) but then dedups at gather time
    because its gloo gather merges per-sample-id dicts. Our evaluator gathers
    flat rows once at the end of eval — duplicate samples would be counted
    twice — so ranks simply take disjoint strided slices of the real index
    range; unequal local lengths are fine because the collective happens
    once, not per batch."""

    def __init__(self, size: int, rank: int = 0, world_size: int = 1):
        self.size = size
        self.rank = rank
        self.world_size = world_size

    def __iter__(self) -> Iterator[int]:
        return iter(range(self.rank, self.size, self.world_size))

    def __len__(self) -> int:
        return len(range(self.rank, self.size, self.world_size))


def collate_event_batch(samples: Sequence, stack_labels: bool):
    """samples: list of (frames, labels, img_size, sample_id); ``frames``
    may also be a tuple of per-slice event arrays (raw-events mode), which
    are stacked component-wise to (B, Tl, N)."""
    if isinstance(samples[0][0], tuple):
        frames = tuple(
            np.stack([s[0][i] for s in samples])
            for i in range(len(samples[0][0]))
        )
    else:
        frames = np.stack([s[0] for s in samples]).astype(np.float32)
    img_sizes = np.array([s[2] for s in samples])
    ids = np.array([s[3] for s in samples])
    if stack_labels:
        labels = np.stack([s[1] for s in samples]).astype(np.float32)
    else:
        labels = [np.asarray(s[1], np.float32) for s in samples]
    return frames, labels, img_sizes, ids


class EventDataLoader:
    """Threaded prefetching loader over an ``EventDetDataset``."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        infinite: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        rank: int = 0,
        world_size: int = 1,
        prefetch_batches: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.infinite = infinite
        self.num_workers = max(num_workers, 1)
        self.prefetch_batches = prefetch_batches
        self.stack_labels = not getattr(dataset, "map_val", False)
        if infinite:
            self.sampler = InfiniteSampler(
                len(dataset), shuffle=shuffle, seed=seed,
                rank=rank, world_size=world_size,
            )
        else:
            self.sampler = SequentialSampler(
                len(dataset), rank=rank, world_size=world_size
            )

    def __len__(self) -> int:
        if self.infinite:
            raise TypeError("infinite loader has no length")
        return -(-len(self.sampler) // self.batch_size)

    def _batches(self) -> Iterator[List[int]]:
        batch: List[int] = []
        for idx in self.sampler:
            batch.append(int(idx))
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.infinite:
            yield batch

    def __iter__(self):
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        pending: "queue.Queue" = queue.Queue()
        batches = self._batches()

        def submit_next():
            try:
                idxs = next(batches)
            except StopIteration:
                return False
            futs = [pool.submit(self.dataset.__getitem__, i) for i in idxs]
            pending.put(futs)
            return True

        try:
            for _ in range(self.prefetch_batches + 1):
                if not submit_next():
                    break
            while not pending.empty():
                futs = pending.get()
                samples = [f.result() for f in futs]
                submit_next()
                yield collate_event_batch(samples, self.stack_labels)
        finally:
            try:
                pool.shutdown(wait=False, cancel_futures=True)
            except Exception:
                # interpreter teardown may have GC'd executor internals when
                # a generator is finalized at exit; nothing left to release
                pass
