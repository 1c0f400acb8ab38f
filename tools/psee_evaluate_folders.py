#!/usr/bin/env python3
"""Standalone Prophesee-protocol evaluation of saved box files.

(reference: yolox/utils/psee_loader/psee_evaluator.py:18-50
evaluate_folders — compares a folder of predicted `.npy` box arrays against
the matching ground-truth `*_bbox.npy` files.)

Usage:
    python tools/psee_evaluate_folders.py --gt /data/gen1/test \
        --dt results/ --camera gen1
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser("prophesee folder eval")
    p.add_argument("--gt", required=True, help="folder of *_bbox.npy GT files")
    p.add_argument("--dt", required=True, help="folder of predicted .npy files")
    p.add_argument("--camera", default="gen1", choices=["gen1", "gen4"])
    p.add_argument("--downsampled-by-2", action="store_true")
    args = p.parse_args()

    from eas_snn_tpu.data.psee_io import load_bboxes
    from eas_snn_tpu.evaluators import evaluate_lists

    gt_files = sorted(glob.glob(os.path.join(args.gt, "*_bbox.npy")))
    assert gt_files, f"no *_bbox.npy files under {args.gt}"
    gt_list, dt_list = [], []
    for g in gt_files:
        base = os.path.basename(g).replace("_bbox.npy", "")
        cands = glob.glob(os.path.join(args.dt, base + "*.npy"))
        assert cands, f"no prediction file for {base} in {args.dt}"
        gt_list.append(np.sort(load_bboxes(g), order="t"))
        dt_list.append(np.sort(load_bboxes(cands[0]), order="t"))

    out = evaluate_lists(
        dt_list, gt_list, camera=args.camera,
        downsampled_by_2=args.downsampled_by_2,
    )
    for k, v in out.items():
        if not isinstance(v, dict):
            print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
