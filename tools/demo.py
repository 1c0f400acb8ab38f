#!/usr/bin/env python3
"""Demo CLI: run detection over a raw event stream and write visualizations.

(reference: the reference exposes event playback + box drawing utilities
(yolox/utils/psee_loader/event_visual.py, utils/visualize.py) but no demo
CLI; this closes that gap with a streaming-inference demo.)

Usage:
    python tools/demo.py -f exps/default/gen1_syolox_s.py -c <ckpt> \
        --input seq_td.dat --out demo_out --fps 20
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("eas_snn_tpu demo")
    p.add_argument("-n", "--name", type=str, default=None)
    p.add_argument("-f", "--exp_file", type=str, default=None)
    p.add_argument("-c", "--ckpt", type=str, default=None)
    p.add_argument("--input", type=str, required=True, help=".dat/.npy stream")
    p.add_argument("--out", type=str, default="demo_out")
    p.add_argument("--fps", type=float, default=20.0,
                   help="detections per second of stream time")
    p.add_argument("--conf", type=float, default=0.3)
    p.add_argument("--max-frames", type=int, default=100)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p


def main():
    args = make_parser().parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eas_snn_tpu.data import EventStream
    from eas_snn_tpu.data.reps import micro_sum
    from eas_snn_tpu.exp import get_exp
    from eas_snn_tpu.inference import StreamingDetector
    from eas_snn_tpu.utils import setup_logger, vis_detections, event_frame_to_image

    logger = setup_logger(None, 0)
    exp = get_exp(args.exp_file, args.name)
    if args.opts:
        exp.merge(args.opts)

    model = exp.get_model()
    stream = EventStream(args.input)
    sh, sw = stream.get_size()
    if sh is None:
        sh, sw = (240, 304)
    h, w = exp.test_size
    sample = jnp.zeros((1, 1, exp.Tm, h, w, exp.in_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    if args.ckpt:
        import orbax.checkpoint as ocp

        from eas_snn_tpu.core.checkpoint import load_partial_params

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
        params = restored.get("ema_params") or restored.get("params", restored)
        variables = dict(variables)
        variables["params"] = load_partial_params(variables["params"], params)

    det = StreamingDetector(
        model, variables,
        img_size=(sh, sw), input_size=exp.test_size, Tm=exp.Tm,
        window_us=abs(exp.window) * 1000, num_classes=exp.num_classes,
        confthre=args.conf, nmsthre=exp.nmsthre,
    )

    os.makedirs(args.out, exist_ok=True)
    step_us = int(1e6 / args.fps)
    t = stream.first_time() + abs(exp.window) * 1000
    n = 0
    while t < stream.total_time() and n < args.max_frames:
        det.push(stream.events_between(t - step_us, t))
        dets = det.detect(t)
        window = stream.events_between(t - abs(exp.window) * 1000, t)
        frame = micro_sum(window, 1, sh, sw)[0] if len(window) else np.zeros(
            (sh, sw, 2), np.float32
        )
        img = event_frame_to_image(frame)
        if dets is not None:
            img = vis_detections(
                img, dets[:, :4], dets[:, 4] * dets[:, 5], dets[:, 6],
                conf=args.conf,
                class_names=getattr(exp, "class_names", ()),
            )
        cv2.imwrite(os.path.join(args.out, f"frame_{n:05d}.png"), img)
        t += step_us
        n += 1
    logger.info(f"wrote {n} frames to {args.out}")


if __name__ == "__main__":
    main()
