"""Samplers and the batched event data loader.

Replaces the reference's torch DataLoader stack (reference:
yolox/data/samplers.py:30-85 InfiniteSampler, dataloading.py:32-113,
data_prefetcher.py:8-52) with a dependency-free pipeline:

  * ``InfiniteSampler`` — seeded infinite shuffled index stream, strided by
    (process_index, process_count) for multi-host DP (the reference strides
    by DDP rank, samplers.py:69-73);
  * ``EventDataLoader`` — worker pool decodes/augments samples ahead of
    time into a bounded prefetch pipeline (the host-side analogue of the
    CUDA-stream DataPrefetcher; on TPU the transfer overlap comes from
    ``jax.device_put`` on the next batch while the current step runs).
    ``worker_mode='process'`` forks per-batch worker processes (the
    reference's torch multi-process workers, dataloading.py:32-113) —
    measured 8 GIL-bound threads at 16 samples/s vs 67 samples/s for ONE
    thread on the Gen1 path, so processes are the default for training;
    ``'thread'`` remains for map_val / tests / interactive use;
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
    once, not per batch.

    INVARIANT (multi-process safety): because per-rank batch counts and the
    last batch's shape differ across ranks, the eval loop consuming this
    sampler must contain NO per-batch cross-host collectives — eval batches
    must never be device_put with a global-batch sharding or run under a TP
    mesh. The single end-of-eval gather (`_allgather_rows`) pads to the max
    row count first, so it is shape-uniform. If per-batch collectives are
    ever needed, switch to padded equal-length sampling and drop padded
    sample ids before the gather."""

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
        # copy=False: samples are already float32 (reps/augment emit f32),
        # so astype would otherwise re-copy the freshly-stacked batch —
        # at flagship geometry that is a ~2.6 MB/sample redundant memcpy.
        frames = np.stack([s[0] for s in samples]).astype(
            np.float32, copy=False
        )
    img_sizes = np.array([s[2] for s in samples])
    ids = np.array([s[3] for s in samples])
    if stack_labels:
        labels = np.stack([s[1] for s in samples]).astype(
            np.float32, copy=False
        )
    else:
        labels = [np.asarray(s[1], np.float32) for s in samples]
    return frames, labels, img_sizes, ids


def _proc_worker_main(dataset, in_q, out_q, stack_labels, seed, wid,
                      shm_names):
    """Batch worker loop (fork start method keeps mmap'd event streams).

    Each worker collates its whole batch, then writes the (big) frame
    tensor straight into a shared-memory ring slot — pickling ~170 MB
    batches through a multiprocessing queue measured SLOWER than the
    GIL-bound thread pool; with the shm ring only the small arrays
    (labels/sizes/ids) ride the queue. Per-worker RNG reseed mirrors the
    reference's worker_init_reset_seed (dataloading.py:109-113)."""
    from multiprocessing import shared_memory

    if hasattr(dataset, "rng"):
        dataset.rng = np.random.default_rng(seed + 1000 * (wid + 1))
    shms = {}
    try:
        while True:
            task = in_q.get()
            if task is None:
                break
            bid, idxs, slot = task
            try:
                samples = [dataset[i] for i in idxs]
                dense = not isinstance(samples[0][0], tuple)
                if slot is not None and dense:
                    # stack frames straight into the shm ring slot: one
                    # write per sample instead of stack-then-copy (two
                    # full passes over a ~170 MB batch)
                    if slot not in shms:
                        shms[slot] = shared_memory.SharedMemory(
                            name=shm_names[slot]
                        )
                    shape = (len(samples),) + np.shape(samples[0][0])
                    view = np.ndarray(
                        shape, np.float32, buffer=shms[slot].buf
                    )
                    for j, s in enumerate(samples):
                        view[j] = s[0]
                    _, labels, sizes, ids = collate_event_batch(
                        [(np.empty(0),) + tuple(s[1:]) for s in samples],
                        stack_labels,
                    )
                    out_q.put(
                        (bid, slot, shape, "float32", labels, sizes, ids)
                    )
                else:
                    frames, labels, sizes, ids = collate_event_batch(
                        samples, stack_labels
                    )
                    out_q.put((bid, None, None, None,
                               (frames, labels, sizes, ids), None, None))
            except Exception as e:  # propagate instead of dying silently
                import traceback

                out_q.put((bid, "error",
                           f"{type(e).__name__}: {e}\n"
                           + traceback.format_exc(), None, None, None, None))
                continue
    finally:
        for shm in shms.values():
            shm.close()


class EventDataLoader:
    """Prefetching loader over an ``EventDetDataset`` with thread or
    forked-process workers."""

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
        worker_mode: str = "thread",
    ):
        import os as _os

        self.dataset = dataset
        self.batch_size = batch_size
        self.infinite = infinite
        # more workers than spare cores is strictly counterproductive:
        # measured on a 1-core host, 1 thread = 59 samples/s,
        # 2 threads = 37, 8 threads = 16 (pure context-switch loss)
        cpu_cap = max(1, (_os.cpu_count() or 1) - 1)
        self.num_workers = max(1, min(num_workers, cpu_cap))
        self.prefetch_batches = prefetch_batches
        self.worker_mode = worker_mode if cpu_cap > 1 else "thread"
        self.seed = seed
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
        if self.worker_mode == "process":
            yield from self._iter_processes()
            return
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


    def _iter_processes(self):
        """Forked batch workers + a shared-memory ring for the frame
        tensors; results reordered to submission order."""
        import multiprocessing as mp
        from multiprocessing import shared_memory

        ctx = mp.get_context("fork")
        n_slots = self.num_workers + self.prefetch_batches
        # probe one sample for the frame payload size (tuple frames from
        # raw-events mode are small and skip the ring)
        probe = self.dataset[0][0]
        use_shm = not isinstance(probe, tuple)
        shm_blocks, shm_names = [], []
        if use_shm:
            nbytes = int(np.prod(probe.shape)) * 4 * self.batch_size
            for i in range(n_slots):
                blk = shared_memory.SharedMemory(create=True, size=nbytes)
                shm_blocks.append(blk)
                shm_names.append(blk.name)

        in_q = ctx.Queue()
        out_q = ctx.Queue()
        workers = [
            ctx.Process(
                target=_proc_worker_main,
                args=(self.dataset, in_q, out_q, self.stack_labels,
                      self.seed, wid, shm_names),
                daemon=True,
            )
            for wid in range(self.num_workers)
        ]
        for w in workers:
            w.start()

        batches = self._batches()
        next_submit = 0
        next_yield = 0
        buffered = {}
        free_slots = list(range(n_slots)) if use_shm else [None] * n_slots

        def submit():
            nonlocal next_submit
            if not free_slots:
                return False
            try:
                idxs = next(batches)
            except StopIteration:
                return False
            in_q.put((next_submit, idxs, free_slots.pop()))
            next_submit += 1
            return True

        def decode(msg):
            bid, slot, shape, dtype, small, sizes, ids = msg
            if slot == "error":
                raise RuntimeError(f"loader worker failed: {shape}")
            if slot is None:
                frames, labels, sizes, ids = small
            else:
                view = np.ndarray(
                    shape, np.dtype(dtype), buffer=shm_blocks[slot].buf
                )
                frames = np.array(view)  # copy out; slot is reused
                labels = small
                free_slots.append(slot)
            if slot is None:
                free_slots.append(None)
            return frames, labels, sizes, ids

        try:
            in_flight = 0
            for _ in range(n_slots):
                if submit():
                    in_flight += 1
                else:
                    break
            import queue as _q

            while in_flight > 0:
                while next_yield not in buffered:
                    try:
                        msg = out_q.get(timeout=30)
                    except _q.Empty:
                        dead = [w for w in workers if not w.is_alive()]
                        if dead:
                            raise RuntimeError(
                                f"{len(dead)} loader worker(s) died "
                                f"(exitcodes {[w.exitcode for w in dead]})"
                            )
                        continue
                    buffered[msg[0]] = msg
                msg = buffered.pop(next_yield)
                next_yield += 1
                in_flight -= 1
                batch = decode(msg)
                if submit():
                    in_flight += 1
                yield batch
        finally:
            for _ in workers:
                try:
                    in_q.put(None)
                except Exception:
                    pass
            for w in workers:
                try:
                    w.terminate()
                    w.join(timeout=2)
                except Exception:
                    pass
            for blk in shm_blocks:
                try:
                    blk.close()
                    blk.unlink()
                except Exception:
                    pass
