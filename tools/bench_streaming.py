#!/usr/bin/env python3
"""Latency of streaming inference vs the re-bin-everything protocol.

`inference/streaming.py` claims O(new events) host work per detection
against the reference's full-window re-read + re-bin per sample
(reference yolox/data/datasets/gen1.py:115-137 ``generate_slices`` seeks
backwards and re-bins the whole -200 ms window for every label). This
tool measures both on the same synthetic Gen1 stream and the same
flagship model:

  baseline — the product Gen1 val pipeline: per detection, re-read the
             window from the .dat (seek + load), host-bin micro_sum
             frames (native fastbin core), letterbox, ship dense frames,
             jitted forward.  == what tools/eval_event.py does per batch.
  stream   — StreamingDetector: push only the NEW events since the last
             tick into a rolling buffer, ship the padded raw event
             window, bin on device fused with the forward.

Reported per detection: host data-prep ms, end-to-end ms, and the ratio.
(The ~32 ms axon relay round-trip is paid equally by both paths; on-host
TPU deployments don't pay it at all, so the host-ms column is the
portable number.)

Usage: python tools/bench_streaming.py [--ticks 100] [--tick-us 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ticks", type=int, default=100)
    p.add_argument("--tick-us", type=int, default=100_000)
    p.add_argument("--window-us", type=int, default=200_000)
    p.add_argument("--max-events", type=int, default=65536)
    args = p.parse_args()

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ap_drift import _make_stream
    from eas_snn_tpu.data.psee_io import EventStream
    from eas_snn_tpu.exp import get_exp
    from eas_snn_tpu.inference.streaming import StreamingDetector
    from eas_snn_tpu.ops.boxes import postprocess_numpy

    root = "/tmp/bench_streaming"
    os.makedirs(root, exist_ok=True)
    dat = os.path.join(root, "stream_td.dat")
    if not os.path.exists(dat):
        _make_stream(dat, os.path.join(root, "stream_bbox.npy"), seed=11,
                     duration_us=(args.ticks + 4) * args.tick_us
                     + args.window_us)

    exp = get_exp(exp_name="gen1_syolox_m").tpu_deploy()
    model = exp.get_model()
    h, w = exp.test_size
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, exp.Tl, exp.Tm, h, w, exp.in_dim), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, sample, train=False
    )

    ticks = [args.window_us + 100_000 + i * args.tick_us
             for i in range(args.ticks)]

    # ---------------- baseline: re-read + host-bin per detection ----------
    exp.data_dir = root
    ds = exp.get_dataset(training=False, map_val=False)
    assert len(ds.files) >= 1

    from eas_snn_tpu.data.augment import letterbox

    fwd = jax.jit(lambda v, e: model.apply(v, e, train=False))

    def baseline_prep(t1):
        """The reference protocol (gen1.py:115-137): seek back, load the
        full window from disk, bin Tm micro-frames on host (native
        fastbin core), letterbox to model size."""
        ev = ds.search_events(0, t1)              # window re-read
        frames = ds.aggregate(ev)                 # (Tm, H, W, 2) host bin
        frames, _ = letterbox(frames, np.zeros((0, 4)), exp.test_size)
        return frames[None, None]                 # (1, Tl=1, Tm, h, w, 2)

    # warmup + compile both paths
    out = fwd(variables, jnp.asarray(baseline_prep(ticks[0])))
    np.asarray(out)

    host_b, tot_b = [], []
    for t1 in ticks:
        w0 = time.perf_counter()
        frames = baseline_prep(t1)
        w1 = time.perf_counter()
        o = np.asarray(fwd(variables, jnp.asarray(frames)))
        postprocess_numpy(o, exp.num_classes, 0.3, exp.nmsthre)
        w2 = time.perf_counter()
        host_b.append(w1 - w0)
        tot_b.append(w2 - w0)

    # ---------------- streaming: incremental push + device binning --------
    det = StreamingDetector(
        model, variables, img_size=(240, 304), input_size=exp.test_size,
        Tm=exp.Tm, window_us=args.window_us, max_events=args.max_events,
        num_classes=exp.num_classes, confthre=0.3, nmsthre=exp.nmsthre,
    )
    loader2 = EventStream(dat)
    # prime: everything before the first tick
    det.push(loader2.load_delta_t(ticks[0]))
    det.detect(ticks[0] - 1)  # compile

    host_s, tot_s = [], []
    prev = ticks[0]
    for t1 in ticks[1:]:
        pkt = loader2.load_delta_t(t1 - prev)  # only the NEW events
        prev = t1
        w0 = time.perf_counter()
        det.push(pkt)
        w1 = time.perf_counter()
        det.detect(t1 - 1)
        w2 = time.perf_counter()
        host_s.append(w1 - w0)
        tot_s.append(w2 - w0)

    res = {
        "ticks": args.ticks,
        "baseline_host_ms": round(1e3 * float(np.mean(host_b)), 2),
        "baseline_total_ms": round(1e3 * float(np.mean(tot_b)), 2),
        "stream_host_ms": round(1e3 * float(np.mean(host_s)), 3),
        "stream_total_ms": round(1e3 * float(np.mean(tot_s)), 2),
    }
    res["host_speedup"] = round(
        res["baseline_host_ms"] / max(res["stream_host_ms"], 1e-3), 1
    )
    res["total_speedup"] = round(
        res["baseline_total_ms"] / max(res["stream_total_ms"], 1e-3), 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
