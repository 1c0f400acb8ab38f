"""N-Caltech101 detection dataset (ATIS binary streams + contour annotations).

(reference: yolox/data/datasets/ncaltech.py:22-400 — ATIS decode with
13-bit-overflow handling, binary annotation parsing, deterministic per-class
0.8/0.2 split files, equal-duration slicing, measure-weighted aggregation.
The reference's undefined ``SpeedVariator`` crash when ``speed_aug=True``
(SURVEY.md §2.11) is replaced by a working event-time rescaling.)
"""

from __future__ import annotations

import math
import os
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .event_dataset import EventDetDataset
from .reps import slice_time_windows, timesurface, timesurface_measure, voxel_cube, voxel_grid

__all__ = ["NCaltechDataset", "read_atis_events", "read_ncaltech_annotation", "encode_atis"]

ATIS_DTYPE = np.dtype([("x", "<i8"), ("y", "<i8"), ("t", "<i8"), ("p", "<i8")])


def read_atis_events(
    path_or_bytes, window: Optional[Tuple[int, int]] = None
) -> np.ndarray:
    """Decode an ATIS `.bin` stream into a structured (x, y, t, p) array.

    Format: 5 bytes/event — x, y, then a 23-bit big-endian timestamp whose
    top bit of the first byte is the polarity; rows with y == 240 are
    timestamp-overflow markers adding 2^13 us to all later events
    (reference read_ATIS: ncaltech.py:63-96 — the reference's per-overflow
    python loop becomes one cumsum). ``window=(w0, w1)`` with w0 < 0 keeps
    only events in (t_last + w0, t_last + w1].
    """
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = np.frombuffer(path_or_bytes, np.uint8).astype(np.uint32)
    else:
        raw = np.fromfile(path_or_bytes, np.uint8).astype(np.uint32)
    x = raw[0::5]
    y = raw[1::5]
    p = (raw[2::5] & 128) >> 7
    t = ((raw[2::5] & 127) << 16) | (raw[3::5] << 8) | raw[4::5]
    t = t.astype(np.int64) + (1 << 13) * np.cumsum(y == 240)
    keep = y != 240
    out = np.empty(int(keep.sum()), ATIS_DTYPE)
    out["x"], out["y"], out["t"], out["p"] = x[keep], y[keep], t[keep], p[keep]
    if window is not None and window[0] < 0 and len(out):
        lo, hi = out["t"][-1] + window[0], out["t"][-1] + window[1]
        out = out[(out["t"] > lo) & (out["t"] <= hi)]
    return out


def encode_atis(t, x, y, p) -> bytes:
    """Inverse of read_atis_events — write a synthetic ATIS `.bin` stream
    (used by tests/fixtures; no overflow rows; t < 2^23)."""
    t = np.asarray(t, np.int64)
    assert (t < (1 << 23)).all()
    out = np.empty((len(t), 5), np.uint8)
    out[:, 0] = x
    out[:, 1] = y
    out[:, 2] = (np.asarray(p, np.int64) << 7) | (t >> 16)
    out[:, 3] = (t >> 8) & 255
    out[:, 4] = t & 255
    return out.tobytes()


def read_ncaltech_annotation(path: str) -> Tuple[List[int], np.ndarray]:
    """Parse a binary annotation file: (box [x1, y1, x2, y2], contour).

    Layout: int16 rows, int16 cols, rows*cols int16 (Fortran order) for the
    box contour, then the same for the object contour
    (reference read_annotation: ncaltech.py:107-127).
    """
    with open(path, "rb") as f:
        rows, = struct.unpack("h", f.read(2))
        cols, = struct.unpack("h", f.read(2))
        box_contour = np.fromfile(f, np.int16, rows * cols).reshape(
            (rows, cols), order="F"
        )
        rows, = struct.unpack("h", f.read(2))
        cols, = struct.unpack("h", f.read(2))
        obj_contour = np.fromfile(f, np.int16, rows * cols).reshape(
            (rows, cols), order="F"
        )
    box = [
        int(box_contour[0].min()), int(box_contour[1].min()),
        int(box_contour[0].max()), int(box_contour[1].max()),
    ]
    return box, obj_contour


def write_split_files(root: str, train_ratio=0.8, val_ratio=0.2, seed=0):
    """Create deterministic train/val/test split files per class
    (reference split_dataset: ncaltech.py:136-170)."""
    data_path = os.path.join(root, "Caltech101")
    ann_path = os.path.join(root, "Caltech101_annotations")
    if os.path.exists(os.path.join(root, "train.txt")):
        return
    rng = np.random.default_rng(seed)
    splits = {"train": [], "val": [], "test": []}
    for cls_name in sorted(os.listdir(data_path)):
        names = sorted(os.listdir(os.path.join(data_path, cls_name)))
        rng.shuffle(names)
        pairs = [
            (
                os.path.join("Caltech101", cls_name, n),
                os.path.join(
                    "Caltech101_annotations", cls_name,
                    n.replace("image", "annotation"),
                ),
            )
            for n in names
        ]
        n_train = math.ceil(len(pairs) * train_ratio)
        n_val = int(len(pairs) * val_ratio)
        splits["train"] += pairs[:n_train]
        splits["val"] += pairs[n_train:n_train + n_val]
        splits["test"] += pairs[n_train + n_val:]
    for split, pairs in splits.items():
        with open(os.path.join(root, f"{split}.txt"), "w") as f:
            f.writelines(" ".join(p) + "\n" for p in pairs)


class NCaltechDataset(EventDetDataset):
    """One object box per sample; 100 classes; 240x180 sensor."""

    def __init__(
        self,
        data_dir: str,
        input_size=(640, 640),
        split: str = "train",
        window: Optional[Tuple[int, int]] = None,
        speed_aug: bool = False,
        speed_scale: Tuple[float, float] = (0.5, 1.5),
        tau: float = 500e3,
        **kw,
    ):
        self.split = split
        self.stream_window = window
        self.speed_aug = speed_aug
        self.speed_scale = speed_scale
        self.tau = tau
        self.file_list: List[Tuple[str, str]] = []
        kw.setdefault("window", (0, 0))
        kw.setdefault("jitter", 0.1)  # ncaltech.py:371 uses jitter=.1
        super().__init__(data_dir, input_size, img_size=(180, 240), **kw)

    def _load_index(self):
        root = self.data_dir
        cls_dir = os.path.join(root, "Caltech101")
        names = tuple(
            n for n in sorted(os.listdir(cls_dir)) if n != "BACKGROUND_Google"
        )
        if not self.class_names:
            self.class_names = names
        self.name_to_idx = {n: i for i, n in enumerate(self.class_names)}
        write_split_files(root)
        with open(os.path.join(root, f"{self.split}.txt")) as f:
            lines = [l.strip() for l in f if l.strip()]
        for line in lines:
            if "BACKGROUND_Google" in line:
                continue
            data_rel, label_rel = line.split(" ")
            cls_name = data_rel.split("/")[-2]
            box, _ = read_ncaltech_annotation(os.path.join(root, label_rel))
            boxes = np.array(
                [box + [self.name_to_idx[cls_name]]], np.float32
            )
            self.files.append(os.path.join(root, data_rel))
            self.labels.append([(0, boxes)])

    def sample_name(self, file_idx: int, group_idx: int) -> str:
        path = self.files[file_idx]
        cls_name = path.split(os.sep)[-2]
        stem = os.path.basename(path).split(".")[0]
        return f"{cls_name}-{stem}"

    # ------------------------------------------------------------------
    def _measure(self, events: np.ndarray, t_target) -> np.ndarray:
        if self.measure == "count":
            return np.ones(len(events), np.float64)
        if self.measure == "timesurface":
            return timesurface_measure(
                events["t"].astype(np.float64), float(t_target), self.tau, "tanh"
            )
        raise NotImplementedError(self.measure)

    def _sum_frame(self, events, t_target) -> np.ndarray:
        h, w = self.img_size
        frame = np.zeros((2, h, w), np.float64)
        if events is not None and len(events):
            np.add.at(
                frame,
                (
                    events["p"].astype(np.int64) & 1,
                    events["y"].astype(np.int64),
                    events["x"].astype(np.int64),
                ),
                self._measure(events, t_target),
            )
        return np.moveaxis(frame, 0, -1).astype(np.float32)  # (H, W, 2)

    def aggregate(self, events, t_target=None):
        """Measure-weighted aggregation (ncaltech.py:227-270)."""
        h, w = self.img_size
        Tm = self.micro_slice
        agg = self.aggregation
        if t_target is None and events is not None and len(events):
            t_target = events["t"][-1]
        if agg == "sum":
            return self._sum_frame(events, t_target)
        if agg == "voxel_grid":
            return voxel_grid(events, h, w, n_time_bins=Tm)
        if agg == "voxel_cube":
            return voxel_cube(events, h, w, num_slices=Tm, tbins=2)
        if agg == "timesurface":
            slices, dt = slice_time_windows(events, Tm, self.overlap)
            return timesurface(slices, h, w, dt=dt, tau=10e3)
        if agg.startswith("micro_"):
            slices, _ = slice_time_windows(events, Tm, 0.0)
            sub = agg.split("micro_")[-1]
            frames = []
            for ms in slices:
                if sub == "sum":
                    frames.append(self._sum_frame(ms, t_target))
                else:
                    raise NotImplementedError(f"micro aggregation '{sub}'")
            return np.stack(frames, 0)
        raise NotImplementedError(agg)

    def generate_slices(self, file_idx: int, group_idx: int) -> np.ndarray:
        events = read_atis_events(self.files[file_idx], self.stream_window)
        if self.speed_aug and self.training and len(events):
            # time-axis rescale: a working replacement for the reference's
            # missing SpeedVariator (ncaltech.py:46)
            s = self.rng.uniform(*self.speed_scale)
            events = events.copy()
            events["t"] = (events["t"] * s).astype(np.int64)
        slices, _ = slice_time_windows(events, self.num_slice, self.overlap)
        frames = [
            self.aggregate(
                ev, t_target=(ev["t"][-1] if ev is not None and len(ev) else None)
            )
            for ev in slices
        ]
        return np.stack(frames, 0)
