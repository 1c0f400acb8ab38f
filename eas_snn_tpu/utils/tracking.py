"""Experiment tracking: JSONL metrics log + optional TensorBoard / wandb.

(reference: yolox/utils/logger.py WandbLogger + tensorboard scalars in
core/trainer.py:292-304 — the always-available backend here is a structured
JSONL stream (one {"step", "split", ...} object per line, trivially
greppable/plottable); TensorBoard and wandb are used transparently when
importable, or demanded explicitly with ``backend="wandb"`` /
``backend="tensorboard"`` mirroring the reference CLI's ``--logger`` flag,
tools/train_event.py:86-92.)
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

__all__ = ["MetricsTracker"]


class MetricsTracker:
    """JSONL always; TensorBoard/wandb as available.

    backend: 'auto' uses every importable backend; 'jsonl' only the file;
    'tensorboard'/'wandb' require that backend (raise if unimportable, the
    reference fails the same way when ``--logger wandb`` without wandb).
    """

    def __init__(self, output_dir: str, enabled: bool = True,
                 backend: str = "auto",
                 run_config: Optional[Dict] = None):
        self.enabled = enabled
        self._f = None
        self._tb = None
        self._wandb = None
        if not enabled:
            return
        os.makedirs(output_dir, exist_ok=True)
        self._f = open(os.path.join(output_dir, "metrics.jsonl"), "a")
        if backend in ("auto", "tensorboard"):
            try:
                from torch.utils.tensorboard import SummaryWriter  # type: ignore

                self._tb = SummaryWriter(os.path.join(output_dir, "tb"))
            except Exception:
                if backend == "tensorboard":
                    raise
                self._tb = None
        if backend in ("auto", "wandb"):
            try:
                import wandb  # type: ignore

                self._wandb = wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "eas-snn-tpu"),
                    name=os.path.basename(output_dir.rstrip(os.sep)) or None,
                    dir=output_dir,
                    config=dict(run_config or {}),
                    resume="allow",
                )
            except Exception:
                if backend == "wandb":
                    raise
                self._wandb = None

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
        if self._wandb is not None:
            self._wandb.log(
                {f"{split}/{k}": float(v) for k, v in metrics.items()},
                step=int(step),
            )

    def log_pred_images(self, step: int, frames, detections,
                        class_names=(), split: str = "val",
                        conf: float = 0.3, max_images: int = 8):
        """Log evaluation detection images (reference: WandbLogger's
        val-image prediction logging, yolox/utils/logger.py:320-385).

        frames: iterable of (H, W, 2) polarity-count event frames (or
        already-BGR uint8 images); detections: per-frame (n, 7) arrays
        [x1, y1, x2, y2, obj, cls_conf, cls] (``postprocess_numpy``
        output) or None. Renders boxes and writes PNGs into
        ``<output_dir>/pred_images/`` (the JSONL-backend counterpart of a
        wandb media panel), plus TensorBoard images and wandb.Image with
        box metadata when those backends are live.
        """
        if not self.enabled or self._f is None:
            return []
        import numpy as np

        from .visualize import event_frame_to_image, vis_detections

        img_dir = os.path.join(os.path.dirname(self._f.name), "pred_images")
        os.makedirs(img_dir, exist_ok=True)
        written = []
        wandb_imgs = []
        for i, (frame, det) in enumerate(zip(frames, detections)):
            if i >= max_images:
                break
            frame = np.asarray(frame)
            if frame.ndim > 3:  # (Tl, Tm, H, W, 2) slices -> one count frame
                frame = frame.reshape((-1,) + frame.shape[-3:]).sum(0)
            img = (frame if frame.ndim == 3 and frame.shape[-1] == 3
                   and frame.dtype == np.uint8
                   else event_frame_to_image(frame))
            if det is not None and len(det):
                det = np.asarray(det)
                img = vis_detections(
                    img, det[:, :4], det[:, 4] * det[:, 5],
                    det[:, 6].astype(int), conf=conf,
                    class_names=class_names,
                )
            path = os.path.join(img_dir, f"step{int(step):08d}_{i}.png")
            import cv2

            cv2.imwrite(path, img)
            written.append(path)
            if self._tb is not None:
                self._tb.add_image(
                    f"{split}/pred_{i}", img[..., ::-1], int(step),
                    dataformats="HWC",
                )
            if self._wandb is not None:
                import wandb  # type: ignore

                box_data = []
                if det is not None:
                    for b in det:
                        if float(b[4] * b[5]) < conf:
                            continue
                        cid = int(b[6])
                        box_data.append({
                            "position": {
                                "minX": float(b[0]), "minY": float(b[1]),
                                "maxX": float(b[2]), "maxY": float(b[3]),
                            },
                            "domain": "pixel",
                            "class_id": cid,
                            "scores": {"conf": float(b[4] * b[5])},
                        })
                wandb_imgs.append(wandb.Image(
                    img[..., ::-1],
                    boxes={"predictions": {
                        "box_data": box_data,
                        "class_labels": {
                            j: n for j, n in enumerate(class_names)},
                    }},
                ))
        if self._wandb is not None and wandb_imgs:
            self._wandb.log({f"{split}/predictions": wandb_imgs},
                            step=int(step))
        return written

    def log_artifact(self, path: str, name: str, kind: str = "model"):
        """Register a file (e.g. a checkpoint dir) as a wandb artifact
        (reference: WandbLogger.save_checkpoint, yolox/utils/logger.py)."""
        if self._wandb is None or not self.enabled:
            return
        import wandb  # type: ignore

        art = wandb.Artifact(name=name, type=kind)
        if os.path.isdir(path):
            art.add_dir(path)
        else:
            art.add_file(path)
        self._wandb.log_artifact(art)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
