#!/usr/bin/env python3
"""Loader scale model: measured per-stage host costs -> cores needed.

The bench host has ONE CPU core, so end-to-end loader throughput here
(5 f/s dense / 21 f/s device-binned, tools/bench_suite.py) says nothing
about a real TPU host (typically 96-224 cores). This tool measures the
per-SAMPLE cost of each pipeline stage in isolation — decode (.dat
window read), bin (fastbin micro_sum), augment (resize/place/flip),
collate — at flagship Gen1 geometry, then prints the workers x cores
model: process workers each pay the full per-sample cost, so

    sustained f/s  =  workers x 1000 / per_sample_ms   (workers <= cores-1)

(reference anchor: the same per-stage pain drove gen1.py:84,195-196's
profile hooks; its loader materializes the same dense frames per
sample). The process-worker ring itself is validated at 8 workers in
tests/test_data.py::TestProcessLoader.

Usage: python tools/loader_scale_model.py [--samples 64] [--json out]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 256, 320
TM = 4


def measure(samples: int):
    from bench_suite import _synth_gen1_dir  # noqa: E402  (tools/ on path)

    from eas_snn_tpu.data.gen1 import Gen1Dataset
    from eas_snn_tpu.data.loader import collate_event_batch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    root = _synth_gen1_dir("/tmp/bench_gen1")

    out = {}
    for split, training in (("train", True), ("eval", False)):
        ds = Gen1Dataset(
            root, input_size=(H, W), training=training,
            aggregation="micro_sum", num_slice=1, micro_slice=TM,
            window=(-200_000, 0),
        )
        n = min(samples, len(ds))

        # stage 1+2 via the dataset's own profile hooks (slicing =
        # decode+bin, augment = geometry), then decode alone directly.
        ds.profile = {"slicing_s": 0.0, "augment_s": 0.0, "count": 0}
        t0 = time.perf_counter()
        batch = [ds[i % len(ds)] for i in range(n)]
        total_s = time.perf_counter() - t0

        dec_s = 0.0
        for i in range(n):
            fi, gi = ds.resolve_index(i % len(ds))
            ts = int(ds.labels[fi][gi][0])
            t1 = time.perf_counter()
            ds.search_events(fi, ts)
            dec_s += time.perf_counter() - t1

        t2 = time.perf_counter()
        for k in range(0, n, 16):
            collate_event_batch(batch[k:k + 16], stack_labels=training)
        col_s = time.perf_counter() - t2

        slicing = ds.profile["slicing_s"] / n * 1000
        decode = dec_s / n * 1000
        out[split] = {
            "decode_ms": round(decode, 2),
            "bin_ms": round(max(0.0, slicing - decode), 2),
            "augment_ms": round(ds.profile["augment_s"] / n * 1000, 2),
            "collate_ms": round(col_s / n * 1000, 2),
            "total_ms": round(total_s / n * 1000 + col_s / n * 1000, 2),
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--json", default=None)
    args = p.parse_args()

    stages = measure(args.samples)
    print(f"per-sample host cost at flagship geometry ({H}x{W}, Tm={TM}):")
    print(f"{'split':6s} {'decode':>8s} {'bin':>8s} {'augment':>8s} "
          f"{'collate':>8s} {'total':>8s}  (ms)")
    for split, s in stages.items():
        print(f"{split:6s} {s['decode_ms']:8.2f} {s['bin_ms']:8.2f} "
              f"{s['augment_ms']:8.2f} {s['collate_ms']:8.2f} "
              f"{s['total_ms']:8.2f}")

    # the device consumption rates to sustain (BENCHMARKS.md headline:
    # eval 2068 f/s B=128; train ~430 f/s at the round-5 297.9 ms step)
    targets = {"eval": 2000.0, "train": 430.0}
    model = {}
    print("\nworkers x cores model (process workers, each pays the full "
          "per-sample cost;\nloader caps workers at cores-1):")
    for split, fps in targets.items():
        ms = stages[split]["total_ms"]
        per_worker = 1000.0 / ms
        need = fps / per_worker
        model[split] = {
            "per_worker_fps": round(per_worker, 1),
            "target_fps": fps,
            "workers_needed": int(np.ceil(need)),
            "cores_needed": int(np.ceil(need)) + 1,
        }
        print(f"  {split}: {per_worker:6.1f} f/s/worker -> "
              f"{model[split]['workers_needed']} workers "
              f"({model[split]['cores_needed']} cores) for {fps:.0f} f/s")
    print("\n(this host has", os.cpu_count(), "core(s); the end-to-end "
          "numbers in BENCHMARKS.md are 1-core-bound by design)")

    result = {"stages": stages, "model": model,
              "host_cores": os.cpu_count()}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
