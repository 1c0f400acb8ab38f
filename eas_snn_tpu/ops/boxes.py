"""Box geometry ops: IoU, coordinate conversions, NMS.

Vectorized JAX counterparts of the reference's torch helpers
(reference: yolox/utils/boxes.py:33-154, yolox/models/losses.py:9-53).
Boxes are float arrays; formats are 'cxcywh' (center x/y, width, height) and
'xyxy' (corners).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "cxcywh2xyxy",
    "xyxy2cxcywh",
    "pairwise_iou",
    "iou_loss",
    "nms_numpy",
    "postprocess_numpy",
]


def cxcywh2xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def pairwise_iou(a: jnp.ndarray, b: jnp.ndarray, xyxy: bool = False) -> jnp.ndarray:
    """IoU matrix between (M, 4) and (A, 4) boxes.

    (reference semantics: yolox/utils/boxes.py:80-103 bboxes_iou)
    """
    if xyxy:
        tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
        br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
        area_a = jnp.prod(a[:, 2:] - a[:, :2], axis=-1)
        area_b = jnp.prod(b[:, 2:] - b[:, :2], axis=-1)
    else:
        tl = jnp.maximum(
            a[:, None, :2] - a[:, None, 2:] / 2, b[None, :, :2] - b[None, :, 2:] / 2
        )
        br = jnp.minimum(
            a[:, None, :2] + a[:, None, 2:] / 2, b[None, :, :2] + b[None, :, 2:] / 2
        )
        area_a = jnp.prod(a[:, 2:], axis=-1)
        area_b = jnp.prod(b[:, 2:], axis=-1)
    valid = jnp.all(tl < br, axis=-1)
    inter = jnp.prod(br - tl, axis=-1) * valid
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str = "iou") -> jnp.ndarray:
    """Elementwise IoU loss between aligned (..., 4) cxcywh boxes.

    'iou' -> 1 - iou^2 ; 'giou' -> 1 - clamped giou.
    (reference semantics: yolox/models/losses.py:15-53)
    """
    tl = jnp.maximum(
        pred[..., :2] - pred[..., 2:] / 2, target[..., :2] - target[..., 2:] / 2
    )
    br = jnp.minimum(
        pred[..., :2] + pred[..., 2:] / 2, target[..., :2] + target[..., 2:] / 2
    )
    area_p = jnp.prod(pred[..., 2:], axis=-1)
    area_g = jnp.prod(target[..., 2:], axis=-1)
    en = jnp.all(tl < br, axis=-1).astype(pred.dtype)
    area_i = jnp.prod(br - tl, axis=-1) * en
    area_u = area_p + area_g - area_i
    iou = area_i / (area_u + 1e-16)
    if loss_type == "iou":
        return 1.0 - iou ** 2
    if loss_type == "giou":
        c_tl = jnp.minimum(
            pred[..., :2] - pred[..., 2:] / 2, target[..., :2] - target[..., 2:] / 2
        )
        c_br = jnp.maximum(
            pred[..., :2] + pred[..., 2:] / 2, target[..., :2] + target[..., 2:] / 2
        )
        area_c = jnp.prod(c_br - c_tl, axis=-1)
        giou = iou - (area_c - area_u) / jnp.clip(area_c, 1e-16)
        return 1.0 - jnp.clip(giou, -1.0, 1.0)
    raise ValueError(loss_type)


# ---------------------------------------------------------------------------
# Host-side postprocess (NMS). Detection counts are data-dependent, so the
# final per-class NMS runs on host numpy over the (already decoded) model
# outputs — mirroring the reference's postprocess
# (yolox/utils/boxes.py:33-77) without torchvision.
# ---------------------------------------------------------------------------

def nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou_thr: float) -> np.ndarray:
    """Pure-numpy hard NMS over xyxy boxes; returns kept indices."""
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1)
        h = np.maximum(0.0, yy2 - yy1)
        inter = w * h
        iou = inter / (areas[i] + areas[order[1:]] - inter + 1e-12)
        order = order[1:][iou <= iou_thr]
    return np.asarray(keep, dtype=np.int64)


def postprocess_numpy(
    prediction: np.ndarray,
    num_classes: int,
    conf_thre: float = 0.7,
    nms_thre: float = 0.45,
    class_agnostic: bool = False,
):
    """Per-image confidence filter + (batched) class-aware NMS.

    Args:
      prediction: (B, A, 5 + num_classes) decoded outputs
        [cx, cy, w, h, obj, cls...] with obj/cls already sigmoided.
    Returns:
      list of per-image (n, 7) arrays [x1, y1, x2, y2, obj, cls_conf, cls]
      or None for empty images (matching the reference's output contract,
      yolox/utils/boxes.py:33-77).
    """
    outputs = []
    for pred in prediction:
        box = np.stack(
            [
                pred[:, 0] - pred[:, 2] / 2,
                pred[:, 1] - pred[:, 3] / 2,
                pred[:, 0] + pred[:, 2] / 2,
                pred[:, 1] + pred[:, 3] / 2,
            ],
            axis=1,
        )
        cls_conf = pred[:, 5 : 5 + num_classes]
        cls_ind = cls_conf.argmax(1)
        cls_score = cls_conf[np.arange(len(pred)), cls_ind]
        conf = pred[:, 4] * cls_score
        mask = conf >= conf_thre
        if not mask.any():
            outputs.append(None)
            continue
        dets = np.concatenate(
            [
                box[mask],
                pred[mask, 4:5],
                cls_score[mask, None],
                cls_ind[mask, None].astype(pred.dtype),
            ],
            axis=1,
        )
        if class_agnostic:
            keep = nms_numpy(dets[:, :4], dets[:, 4] * dets[:, 5], nms_thre)
        else:
            # offset boxes by class so NMS is per-class (batched_nms trick)
            offsets = dets[:, 6:7] * (dets[:, :4].max() + 1.0)
            keep = nms_numpy(dets[:, :4] + offsets, dets[:, 4] * dets[:, 5], nms_thre)
        outputs.append(dets[keep])
    return outputs
