#!/usr/bin/env python3
"""Event-stream video playback: render one or several `.dat` streams (with
their `_bbox.npy` boxes) into a tiled mp4 / PNG sequence.

(reference: yolox/utils/psee_loader/event_visual.py:29-87
play_event_stream / play_files_parallel and visualize/vis_utils.py:22-60 —
same binary-histogram rendering, grid tiling, box drawing and delta_t
windowing; headless output (mp4/PNGs) instead of cv2.imshow windows, and
the whole stream is windowed with vectorized searchsorted instead of the
per-file buffered-read loop.)

Usage:
    python tools/play_events.py seq_a_td.dat seq_b_td.dat -t out.mp4
    python tools/play_events.py seq_td.dat --frames outdir/  # PNGs
"""

from __future__ import annotations

import argparse
import glob
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eas_snn_tpu.data.psee_io import EventStream, load_bboxes  # noqa: E402

LABELMAP = ("car", "pedestrian")
LABELMAP_LARGE = (
    "pedestrian", "two wheeler", "car", "truck", "bus",
    "traffic sign", "traffic light",
)


def make_binary_histo(events, img, width, height):
    """Negative events black, positive white, gray background
    (vis_utils.py:22-45)."""
    img[...] = 127
    if len(events):
        img[events["y"], events["x"], :] = (
            255 * events["p"].astype(np.uint8)[:, None]
        )
    return img


def draw_bboxes(img, boxes, labelmap=LABELMAP):
    import cv2

    colors = cv2.applyColorMap(
        np.arange(0, 255, dtype=np.uint8).reshape(-1, 1), cv2.COLORMAP_HSV
    ).reshape(-1, 3)
    for i in range(len(boxes)):
        x, y = int(boxes["x"][i]), int(boxes["y"][i])
        w, h = int(boxes["w"][i]), int(boxes["h"][i])
        cls = int(boxes["class_id"][i])
        color = tuple(int(c) for c in colors[(cls * 60) % 255])
        cv2.rectangle(img, (x, y), (x + w, y + h), color, 1)
        cv2.putText(
            img, labelmap[cls % len(labelmap)], (x, max(y - 2, 8)),
            cv2.FONT_HERSHEY_SIMPLEX, 0.35, color, 1,
        )


def play_files(td_files, delta_t=50000, skip=0, save_path=None,
               frames_dir=None, max_frames=None):
    import cv2

    streams = [EventStream(f) for f in td_files]
    box_arrays = []
    for f in td_files:
        cands = glob.glob(f.split("_td.dat")[0] + "*.npy")
        box_arrays.append(load_bboxes(cands[0]) if cands else None)

    height, width = streams[0].get_size()
    if height is None or width is None:  # .npy / headerless .dat streams
        height, width = 240, 304
    labelmap = LABELMAP if height == 240 else LABELMAP_LARGE

    size_x = int(math.ceil(math.sqrt(len(streams))))
    size_y = int(math.ceil(len(streams) / size_x))
    frame = np.zeros((size_y * height, size_x * width, 3), np.uint8)

    writer = None
    if save_path:
        writer = cv2.VideoWriter(
            save_path, cv2.VideoWriter_fourcc(*"mp4v"), 25,
            (size_x * width, size_y * height),
        )
    if frames_dir:
        os.makedirs(frames_dir, exist_ok=True)

    t_end = max(s.total_time() for s in streams)
    n = 0
    for t0 in range(skip, int(t_end), delta_t):
        for idx, (s, boxes) in enumerate(zip(streams, box_arrays)):
            y, x = divmod(idx, size_x)
            tile = frame[y * height:(y + 1) * height,
                         x * width:(x + 1) * width]
            evs = s.events_between(t0, t0 + delta_t)
            make_binary_histo(evs, tile, width, height)
            if boxes is not None and len(boxes):
                ts = boxes["t"].astype(np.int64)
                sel = boxes[(ts >= t0) & (ts < t0 + delta_t)]
                draw_bboxes(tile, sel, labelmap)
        if writer is not None:
            writer.write(frame)
        if frames_dir:
            cv2.imwrite(os.path.join(frames_dir, f"f{n:06d}.png"), frame)
        n += 1
        if max_frames and n >= max_frames:
            break
    if writer is not None:
        writer.release()
    return n


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("records", nargs="+", help="_td.dat event files")
    p.add_argument("-s", "--skip", type=int, default=0, help="skip first us")
    p.add_argument("-d", "--delta_t", type=int, default=50000)
    p.add_argument("-t", "--to", type=str, default="visualize.mp4")
    p.add_argument("--frames", type=str, default=None,
                   help="also dump PNG frames to this dir")
    p.add_argument("--max-frames", type=int, default=None)
    args = p.parse_args()
    n = play_files(
        args.records, delta_t=args.delta_t, skip=args.skip,
        save_path=args.to, frames_dir=args.frames,
        max_frames=args.max_frames,
    )
    print(f"wrote {n} frames -> {args.to}")


if __name__ == "__main__":
    main()
