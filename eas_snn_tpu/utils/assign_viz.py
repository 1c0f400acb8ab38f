"""SimOTA assignment visualization.

(reference: yolox/models/spiking_yolo_head.py:595 visualize_assign_result +
yolox/utils/demo_utils.py:19 — draws ground-truth boxes and the anchor
centers SimOTA assigned to each of them, for debugging label assignment.)
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from .visualize import _PALETTE, event_frame_to_image

__all__ = ["visualize_assignments"]


def visualize_assignments(
    model,
    variables,
    events,
    labels,
    save_prefix: Optional[str] = None,
):
    """Run the model's train forward, compute SimOTA assignments, and render
    one BGR image per sample: GT boxes (solid) + assigned anchor centers
    (dots, colored by matched GT).

    Args:
      events: (B, Tl, Tm, H, W, C) batch.
      labels: (B, M, 5) [cls, cx, cy, w, h] padded.
    Returns list of (H, W, 3) uint8 images (also written to
    ``{save_prefix}{i}.png`` when given).
    """
    import cv2
    import jax.numpy as jnp

    from ..models.simota import simota_assign

    # train-mode forward without targets returns the train-decoded head
    # outputs (B, A, 5+C): boxes in image units, obj/cls as logits — the
    # exact form SimOTA consumes (models/yolox.py __call__).
    head_out, _ = model.apply(
        variables, jnp.asarray(events), None, train=True,
        mutable=["batch_stats"],
    )
    outputs = np.asarray(head_out)
    B, A = outputs.shape[:2]
    h_in, w_in = events.shape[3], events.shape[4]
    # rebuild stride/grid tables for the standard 8/16/32 pyramid
    gx, gy, sv = [], [], []
    for s in (8, 16, 32):
        hh, ww = h_in // s, w_in // s
        yv, xv = np.meshgrid(np.arange(hh), np.arange(ww), indexing="ij")
        gx.append(xv.reshape(-1))
        gy.append(yv.reshape(-1))
        sv.append(np.full(hh * ww, s, np.float32))
    gx = np.concatenate(gx).astype(np.float32)
    gy = np.concatenate(gy).astype(np.float32)
    sv = np.concatenate(sv)
    assert len(gx) == A, f"anchor mismatch {len(gx)} vs {A}"

    images = []
    labels = np.asarray(labels)
    for b in range(B):
        lab = labels[b]
        gt_valid = lab.sum(-1) > 0
        res = simota_assign(
            jnp.asarray(lab[:, 1:5]), jnp.asarray(lab[:, 0]),
            jnp.asarray(gt_valid),
            jnp.asarray(outputs[b, :, :4]),
            jnp.asarray(outputs[b, :, 5:]),
            jnp.asarray(outputs[b, :, 4]),
            jnp.asarray((gx + 0.5) * sv), jnp.asarray((gy + 0.5) * sv),
            jnp.asarray(sv), outputs.shape[2] - 5,
        )
        fg = np.asarray(res.fg_mask)
        matched = np.asarray(res.matched_gt)
        frame = np.asarray(events[b, 0]).sum(axis=0)  # (H, W, C)
        img = event_frame_to_image(frame[..., :2])
        for gi in np.where(gt_valid)[0]:
            cls_id, cx, cy, w, hh_ = lab[gi]
            color = tuple(int(c) for c in _PALETTE[int(gi) % len(_PALETTE)])
            cv2.rectangle(
                img,
                (int(cx - w / 2), int(cy - hh_ / 2)),
                (int(cx + w / 2), int(cy + hh_ / 2)),
                color, 2,
            )
        for a in np.where(fg)[0]:
            color = tuple(
                int(c) for c in _PALETTE[int(matched[a]) % len(_PALETTE)]
            )
            cv2.circle(
                img,
                (int((gx[a] + 0.5) * sv[a]), int((gy[a] + 0.5) * sv[a])),
                2, color, -1,
            )
        if save_prefix:
            cv2.imwrite(f"{save_prefix}{b}.png", img)
        images.append(img)
    return images
