"""COCO-protocol and Prophesee-protocol evaluators over event datasets.

(reference: yolox/evaluators/event_evaluator.py:84-565 EventEvaluator,
psee_evaluator.py:86-508 PSEEEvaluator.)

Both evaluators drive a jit-compiled forward callable
``forward_fn(events) -> (B, A, 5+C)`` (decoded boxes in input-size units,
obj/cls already sigmoided — the model's eval path), postprocess with
confidence filtering + class-aware NMS on host, and aggregate across
processes with ``multihost_utils.process_allgather`` (replacing the
reference's gloo object-gather, utils/dist.py:195-274).
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.psee_io import BBOX_DTYPE
from ..ops.boxes import postprocess_numpy
from .coco_map import DetEval, EvalResults, summarize
from .prophesee import PropheseeEvaluator, boxes_to_prophesee

__all__ = ["EventEvaluator", "PSEEEvaluator"]


def _allgather_rows(rows: np.ndarray) -> np.ndarray:
    """Gather variable-length row arrays from all hosts (single-host: id).

    ``process_allgather`` requires identical shapes on every process, so
    first gather the per-host row counts, pad to the global max, gather,
    then strip the padding (replaces the reference's pickled gloo gather,
    utils/dist.py:195-274).
    """
    import jax

    if jax.process_count() == 1:
        return rows
    from jax.experimental import multihost_utils

    n = np.asarray(len(rows), np.int64)
    counts = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
    n_max = int(counts.max())
    width = rows.shape[1] if rows.ndim == 2 else 7
    padded = np.zeros((n_max, width), np.float64)
    padded[: len(rows)] = rows
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return np.concatenate(
        [gathered[i, : int(c)] for i, c in enumerate(counts)], axis=0
    )


class EventEvaluator:
    """COCO-protocol mAP over an event dataset (map_val loader)."""

    def __init__(
        self,
        dataloader,
        img_size: Tuple[int, int],
        confthre: float,
        nmsthre: float,
        num_classes: int,
        per_class_report: bool = True,
    ):
        self.dataloader = dataloader
        self.img_size = img_size
        self.confthre = confthre
        self.nmsthre = nmsthre
        self.num_classes = num_classes
        self.per_class_report = per_class_report

    def _letterbox_scale(self, img_h: float, img_w: float) -> float:
        return min(self.img_size[0] / img_h, self.img_size[1] / img_w)

    def evaluate(
        self, forward_fn: Callable[[np.ndarray], np.ndarray]
    ) -> Tuple[float, float, str]:
        """Returns (AP@[.5:.95], AP@.5, summary text)
        (reference evaluate: event_evaluator.py:122-263).

        Row assembly is batch-vectorized numpy (no per-detection python
        loop): at Prophesee scale (~470k GEN1 val boxes) python row appends
        dominated eval wall-clock."""
        det_blocks: List[np.ndarray] = []
        gt_blocks: List[np.ndarray] = []
        n_samples = 0
        fwd_time = 0.0
        nms_time = 0.0

        for frames, labels, img_sizes, ids in self.dataloader:
            t0 = time.perf_counter()
            outputs = np.asarray(forward_fn(frames))
            fwd_time += time.perf_counter() - t0

            t0 = time.perf_counter()
            dets = postprocess_numpy(
                outputs, self.num_classes, self.confthre, self.nmsthre
            )
            nms_time += time.perf_counter() - t0

            for det, (img_h, img_w), sid, lab in zip(
                dets, img_sizes, ids, labels
            ):
                n_samples += 1
                scale = self._letterbox_scale(float(img_h), float(img_w))
                # GT rows: raw-size [cx, cy, w, h, cls] -> corner xywh
                lab = np.asarray(lab, np.float64).reshape(-1, 5)
                if len(lab):
                    g = np.zeros((len(lab), 7), np.float64)
                    g[:, 0] = int(sid)
                    g[:, 1] = lab[:, 4]
                    g[:, 2] = lab[:, 0] - lab[:, 2] / 2
                    g[:, 3] = lab[:, 1] - lab[:, 3] / 2
                    g[:, 4] = lab[:, 2]
                    g[:, 5] = lab[:, 3]
                    gt_blocks.append(g)
                if det is None:
                    continue
                # det: (n, 7) [x1, y1, x2, y2, obj, cls_conf, cls]
                b = det[:, :4].astype(np.float64) / scale
                d = np.empty((len(det), 7), np.float64)
                d[:, 0] = int(sid)
                d[:, 1] = det[:, 6]
                d[:, 2] = b[:, 0]
                d[:, 3] = b[:, 1]
                d[:, 4] = b[:, 2] - b[:, 0]
                d[:, 5] = b[:, 3] - b[:, 1]
                d[:, 6] = det[:, 4] * det[:, 5]
                det_blocks.append(d)

        def _cat(blocks):
            if not blocks:
                return np.zeros((0, 7), np.float64)
            return np.concatenate(blocks, axis=0)

        det_arr = _allgather_rows(_cat(det_blocks))
        gt_arr = _allgather_rows(_cat(gt_blocks))

        res = DetEval(self.num_classes).evaluate(det_arr, gt_arr)
        class_names = getattr(self.dataloader.dataset, "class_names", ())
        text = summarize(
            res, class_names if self.per_class_report else ()
        )
        if n_samples:
            text += (
                f"\n forward: {1000 * fwd_time / n_samples:.2f} ms/img,"
                f" NMS: {1000 * nms_time / n_samples:.2f} ms/img"
            )
        return res.ap, res.ap50, text


class PSEEEvaluator(EventEvaluator):
    """Prophesee-protocol evaluation (reference psee_evaluator.py:86-307):
    predictions are rescaled to sensor resolution, stamped with the label
    time parsed from sample names, buffered, and evaluated with the
    +/-50 ms protocol at the end."""

    def __init__(
        self,
        dataloader,
        img_size: Tuple[int, int],
        confthre: float,
        nmsthre: float,
        num_classes: int,
        camera: str = "gen1",
        downsampled_by_2: bool = False,
    ):
        super().__init__(dataloader, img_size, confthre, nmsthre, num_classes)
        self.camera = camera
        self.downsampled_by_2 = downsampled_by_2

    @staticmethod
    def _parse_name(name: str) -> Tuple[str, int]:
        """'<stream>_r<idx>_a<time>' -> (stream, time_us)
        (reference get_time_from_name: psee_evaluator.py:285)."""
        stream, _, tail = name.rpartition("_r")
        t = int(tail.rpartition("_a")[2])
        return stream, t

    def evaluate(
        self, forward_fn: Callable[[np.ndarray], np.ndarray]
    ) -> Tuple[float, float, str]:
        ds = self.dataloader.dataset
        per_stream_gt: Dict[str, List] = defaultdict(list)
        per_stream_dt: Dict[str, List] = defaultdict(list)
        n_samples = 0
        fwd_time = 0.0

        for frames, labels, img_sizes, ids in self.dataloader:
            t0 = time.perf_counter()
            outputs = np.asarray(forward_fn(frames))
            fwd_time += time.perf_counter() - t0
            dets = postprocess_numpy(
                outputs, self.num_classes, self.confthre, self.nmsthre
            )
            for det, (img_h, img_w), sid, lab in zip(
                dets, img_sizes, ids, labels
            ):
                n_samples += 1
                stream, t_us = self._parse_name(ds.sample_names[int(sid)])
                lab = np.asarray(lab)
                if lab.size:
                    # raw-size rows [cx, cy, w, h, cls] -> corner x/y
                    per_stream_gt[stream].append(
                        (t_us, lab[:, 0] - lab[:, 2] / 2,
                         lab[:, 1] - lab[:, 3] / 2, lab[:, 2], lab[:, 3],
                         lab[:, 4])
                    )
                if det is None:
                    continue
                scale = self._letterbox_scale(float(img_h), float(img_w))
                b = det[:, :4] / scale
                per_stream_dt[stream].append(
                    (t_us, b[:, 0], b[:, 1], b[:, 2] - b[:, 0],
                     b[:, 3] - b[:, 1], det[:, 6], det[:, 4] * det[:, 5])
                )

        # flatten to gatherable rows [stream_idx, t, x, y, w, h, cls, conf];
        # stream names come from the shared dataset table, so indices are
        # globally consistent across hosts (reference gathers per batch over
        # gloo, psee_evaluator.py:231-235)
        stream_names = sorted(
            {self._parse_name(n)[0] for n in ds.sample_names}
        )
        stream_idx = {n: i for i, n in enumerate(stream_names)}

        def flatten(per_stream, with_conf):
            blocks = []
            for stream, parts in per_stream.items():
                si = stream_idx[stream]
                for part in parts:
                    if with_conf:
                        t_us, x, y, w, h, cls, conf = part
                    else:
                        t_us, x, y, w, h, cls = part
                        conf = np.ones(len(x), np.float32)
                    blocks.append(np.column_stack([
                        np.full(len(x), si, np.float64),
                        np.full(len(x), t_us, np.float64),
                        x, y, w, h, cls, conf,
                    ]))
            if not blocks:
                return np.zeros((0, 8), np.float64)
            return np.concatenate(blocks, axis=0).astype(np.float64)

        gt_rows = _allgather_rows(flatten(per_stream_gt, False))
        dt_rows = _allgather_rows(flatten(per_stream_dt, True))

        evaluator = PropheseeEvaluator(self.camera, self.downsampled_by_2)
        for si in range(len(stream_names)):
            g = gt_rows[gt_rows[:, 0] == si]
            d = dt_rows[dt_rows[:, 0] == si]
            if not len(g) and not len(d):
                continue
            evaluator.add_labels(boxes_to_prophesee(
                g[:, 1].astype(np.int64), g[:, 2], g[:, 3], g[:, 4], g[:, 5],
                g[:, 6].astype(np.int64), g[:, 7].astype(np.float32),
            ) if len(g) else np.zeros(0, BBOX_DTYPE))
            evaluator.add_predictions(boxes_to_prophesee(
                d[:, 1].astype(np.int64), d[:, 2], d[:, 3], d[:, 4], d[:, 5],
                d[:, 6].astype(np.int64), d[:, 7].astype(np.float32),
            ) if len(d) else np.zeros(0, BBOX_DTYPE))
        metrics = evaluator.evaluate_buffer()
        text = "\n".join(
            f" {k}: {v:.4f}" for k, v in metrics.items() if not isinstance(v, dict)
        )
        if n_samples:
            text += f"\n forward: {1000 * fwd_time / n_samples:.2f} ms/img"
        return metrics["AP"], metrics["AP_50"], text
