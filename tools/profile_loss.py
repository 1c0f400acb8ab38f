#!/usr/bin/env python3
"""Microbench of the SimOTA/YOLOX loss pieces at flagship train geometry.

Round-3 review: the SimOTA loss forward (~30 ms at B=32) rivals the whole
model forward and was measured but never attacked. This tool breaks
``yolox_losses`` into sections (same serialized-repeat device timing as
tools/profile_sections.py) so the cut targets are measured, not guessed:

  loss_full   — yolox_losses forward
  loss_grad   — grad of yolox_losses wrt the head outputs
  assign      — the vmapped simota_assign alone
  topk        — the two lax.top_k(10) calls on a (B, M, A) cost tensor
  pairwise    — pairwise_iou (M, A) under vmap
  bce_cls     — the (M, A, C) joint-prob BCE cost

Inputs mimic the flagship head output: A = 1680 anchors (256x320 /8/16/32),
M = 50 padded labels, C = 2 classes, ~3 valid gts per image.

Usage: python tools/profile_loss.py --batch 128 [--K 8]
(reference hot path being attacked: yolox/models/spiking_yolo_head.py:272-593)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_sections import device_ms  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--num-classes", type=int, default=2)
    p.add_argument(
        "--sections", default="loss_full,loss_grad,assign,topk,pairwise,bce_cls"
    )
    args = p.parse_args()
    B, C = args.batch, args.num_classes
    secs = args.sections.split(",")

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eas_snn_tpu.models.simota import simota_assign, yolox_losses
    from eas_snn_tpu.ops.boxes import pairwise_iou

    # flagship anchor grid: 256x320 at strides 8/16/32
    hs, ws = (32, 16, 8), (40, 20, 10)
    gx, gy, st = [], [], []
    for (h, w, s) in zip(hs, ws, (8, 16, 32)):
        yy, xx = np.mgrid[:h, :w]
        gx.append(xx.reshape(-1))
        gy.append(yy.reshape(-1))
        st.append(np.full(h * w, s))
    grid_x = jnp.asarray(np.concatenate(gx), jnp.float32)
    grid_y = jnp.asarray(np.concatenate(gy), jnp.float32)
    strides = jnp.asarray(np.concatenate(st), jnp.float32)
    A = int(grid_x.shape[0])
    M = 50

    rng = np.random.default_rng(0)
    outputs = np.zeros((B, A, 5 + C), np.float32)
    outputs[..., 0] = rng.uniform(0, 320, (B, A))
    outputs[..., 1] = rng.uniform(0, 256, (B, A))
    outputs[..., 2] = rng.uniform(8, 80, (B, A))
    outputs[..., 3] = rng.uniform(8, 80, (B, A))
    outputs[..., 4:] = rng.normal(-2, 1, (B, A, 1 + C))
    labels = np.zeros((B, M, 5), np.float32)
    for b in range(B):
        n = 3
        labels[b, :n, 0] = rng.integers(0, C, n)
        labels[b, :n, 1] = rng.uniform(40, 280, n)
        labels[b, :n, 2] = rng.uniform(40, 216, n)
        labels[b, :n, 3:5] = rng.uniform(16, 80, (n, 2))
    outputs = jnp.asarray(outputs)
    labels = jnp.asarray(labels)

    out = {"batch": B, "A": A, "M": M, "C": C, "K": args.K, "ms": {}}

    def loss_fn(o):
        return yolox_losses(
            o, None, labels, grid_x, grid_y, strides, C, use_l1=False
        ).total_loss

    if "loss_full" in secs:
        out["ms"]["loss_full"] = round(device_ms(loss_fn, outputs, args.K), 2)
        print("loss_full", out["ms"]["loss_full"], flush=True)
    if "loss_grad" in secs:
        out["ms"]["loss_grad"] = round(
            device_ms(jax.grad(loss_fn), outputs, args.K), 2
        )
        print("loss_grad", out["ms"]["loss_grad"], flush=True)

    gt_valid = labels.sum(axis=2) > 0
    acx = (grid_x + 0.5) * strides
    acy = (grid_y + 0.5) * strides

    def assign_fn(o):
        r = jax.vmap(
            lambda gb, gc, gv, pb, cl, ob: simota_assign(
                gb, gc, gv, pb, cl, ob, acx, acy, strides, C
            )
        )(labels[..., 1:5], labels[..., 0], gt_valid,
          o[..., :4], o[..., 5:], o[..., 4:5])
        return r.fg_mask.astype(jnp.float32).sum() + r.pred_iou.sum()

    if "assign" in secs:
        out["ms"]["assign"] = round(device_ms(assign_fn, outputs, args.K), 2)
        print("assign", out["ms"]["assign"], flush=True)

    cost = jnp.asarray(rng.normal(5, 2, (B, M, A)).astype(np.float32))

    def topk_fn(c):
        a = jax.lax.top_k(c, 10)[0]
        b2 = jax.lax.top_k(-c, 10)[0]
        return a.sum() + b2.sum()

    if "topk" in secs:
        out["ms"]["topk"] = round(device_ms(topk_fn, cost, args.K), 2)
        print("topk", out["ms"]["topk"], flush=True)

    def pairwise_fn(o):
        return jax.vmap(
            lambda gb, pb: pairwise_iou(gb, pb)
        )(labels[..., 1:5], o[..., :4]).sum()

    if "pairwise" in secs:
        out["ms"]["pairwise"] = round(
            device_ms(pairwise_fn, outputs, args.K), 2
        )
        print("pairwise", out["ms"]["pairwise"], flush=True)

    def bce_fn(o):
        from eas_snn_tpu.models.simota import _bce_probs

        joint = jnp.sqrt(
            jax.nn.sigmoid(o[..., 5:]) * jax.nn.sigmoid(o[..., 4:5])
        )
        onehot = jax.nn.one_hot(labels[..., 0].astype(jnp.int32), C)
        return _bce_probs(
            joint[:, None, :, :], onehot[:, :, None, :]
        ).sum(-1).sum()

    if "bce_cls" in secs:
        out["ms"]["bce_cls"] = round(device_ms(bce_fn, outputs, args.K), 2)
        print("bce_cls", out["ms"]["bce_cls"], flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
