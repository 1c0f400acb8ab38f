#!/usr/bin/env python3
"""Measure the deployment config's AP drift end-to-end (mAP evidence for
the precision shortcuts).

The headline deployment config stacks int8 spike storage, bf16 sampler
scan state, the measured conv+BN+PLIF fusion policy and 4x4 packed sampler
convs — each defended as "protocol-fair" by analogy to the reference's own
half-precision eval (reference tools/eval_event.py:66 ``--fp16`` ->
``model.half()``, event_evaluator.py:141-144) but each elementwise-
deviating from f32. This tool turns the analogy into a measured statement:

1. writes a synthetic-but-LEARNABLE Gen1-format dataset (moving objects
   emit box-correlated events; real ``.dat``/``_bbox.npy`` bytes through
   the product writers, read back by the product Gen1 pipeline),
2. trains tiny SYOLOX (arsnn sampler + spiking backbone, 64x64) through
   the product Trainer to a nontrivial AP,
3. evaluates the SAME best checkpoint under
     f32    — float32 compute, XLA-scan PLIF, float spike storage, no
              whole-site fusion, unpacked f32-state sampler (pure
              reference arithmetic), and
     deploy — ``exp.tpu_deploy()`` + eval defaults (bf16 compute, bf16
              sampler state, packed convs, int8 spikes, fusion policy):
              exactly what bench.py and the eval CLI's ``--fp16`` run,
4. reports AP/AP50 for both + the deltas and writes ``AP_DRIFT.json``.

Each eval runs in a SUBPROCESS: the precision A/B switches
(EAS_PLIF_FUSE / EAS_SPIKE_STORE / EAS_CONV_PLIF_FUSE /
EAS_BN_AFFINE_FUSE) are read at trace time, and a fresh process guarantees
a fresh jit cache per config.

Usage:
    python tools/ap_drift.py --root /tmp/ap_drift --epochs 200 --batch 8
    python tools/ap_drift.py --root /tmp/ap_drift --skip-train   # reuse ckpt
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H_SENSOR, W_SENSOR = 240, 304
CLASS_SIZES = ((52, 36), (96, 72))  # (w, h) per class — size IS the class


# ---------------------------------------------------------------------------
# 1. learnable synthetic Gen1 data
# ---------------------------------------------------------------------------

def _make_stream(dat_path, npy_path, seed, duration_us=20_000_000,
                 label_every_us=500_000, events_per_s=60_000):
    """One stream: two moving objects (one per class) emit dense event
    clusters inside their boxes; sparse uniform background noise. Labels
    snapshot the boxes on a fixed clock, like Gen1's 60 Hz-ish GT."""
    from eas_snn_tpu.data.psee_io import write_bboxes_npy, write_dat_events

    rng = np.random.default_rng(seed)
    n_total = int(events_per_s * duration_us / 1e6)

    # object trajectories: sinusoidal, inside the sensor with margin
    phases = rng.uniform(0, 2 * np.pi, (2, 2))
    freqs = rng.uniform(0.05, 0.2, (2, 2))  # Hz

    def centers(ts_us):
        t = ts_us / 1e6
        out = []
        for k, (w, h) in enumerate(CLASS_SIZES):
            mx, my = w / 2 + 4, h / 2 + 4
            cx = (W_SENSOR / 2
                  + (W_SENSOR / 2 - mx) * np.sin(
                      2 * np.pi * freqs[k, 0] * t + phases[k, 0]))
            cy = (H_SENSOR / 2
                  + (H_SENSOR / 2 - my) * np.sin(
                      2 * np.pi * freqs[k, 1] * t + phases[k, 1]))
            out.append((cx, cy))
        return out

    t_ev = np.sort(rng.integers(0, duration_us, n_total)).astype(np.int64)
    src = rng.choice(3, n_total, p=[0.4, 0.4, 0.2])  # obj0 / obj1 / noise
    x = rng.integers(0, W_SENSOR, n_total).astype(np.int64)
    y = rng.integers(0, H_SENSOR, n_total).astype(np.int64)
    cs = centers(t_ev)
    for k, (w, h) in enumerate(CLASS_SIZES):
        m = src == k
        cx, cy = cs[k][0][m], cs[k][1][m]
        x[m] = np.clip(
            (cx + rng.uniform(-w / 2, w / 2, m.sum())).astype(np.int64),
            0, W_SENSOR - 1,
        )
        y[m] = np.clip(
            (cy + rng.uniform(-h / 2, h / 2, m.sum())).astype(np.int64),
            0, H_SENSOR - 1,
        )
    p = rng.integers(0, 2, n_total)
    write_dat_events(dat_path, t_ev.astype(np.uint32), x, y, p,
                     H_SENSOR, W_SENSOR)

    rows = []
    # first label late enough that the -200 ms window has events
    for lt in range(300_000, duration_us, label_every_us):
        c = centers(np.asarray([lt], np.float64))
        for k, (w, h) in enumerate(CLASS_SIZES):
            cx, cy = float(c[k][0][0]), float(c[k][1][0])
            rows.append((lt, cx - w / 2, cy - h / 2, w, h, k, k, 1.0))
    write_bboxes_npy(npy_path, rows)


def make_data(root, n_train=6, n_val=3):
    for split, n, base in (("train", n_train, 0), ("val", n_val, 100)):
        d = os.path.join(root, split)
        os.makedirs(d, exist_ok=True)
        for s in range(n):
            dat = os.path.join(d, f"drift{s}_td.dat")
            if not os.path.exists(dat):
                _make_stream(dat, os.path.join(d, f"drift{s}_bbox.npy"),
                             seed=base + s)
    return root


# ---------------------------------------------------------------------------
# 2. shared exp config (tiny SYOLOX at 64x64 / flagship at 256x320)
# ---------------------------------------------------------------------------

def build_exp(root, epochs, geom="tiny"):
    from eas_snn_tpu.exp import get_exp

    exp = get_exp(exp_name="gen1_syolox_s")
    if geom == "flagship":
        # the preset's OWN geometry: SYOLOX-S (width 0.50) at 256x320,
        # arsnn depth-2 ksize-5, T=Ts=3/Tm=4 — the reference README's
        # published Gen1 config (readme.md:124-128). Only dataset/run
        # knobs are overridden.
        size_opts = []
    else:
        size_opts = [
            "input_size", "(64, 64)", "test_size", "(64, 64)",
            "depth", "0.33", "width", "0.125",
        ]
    exp.merge(size_opts + [
        "data_dir", root,
        "max_epoch", str(epochs),
        "eval_interval", "20", "print_interval", "10",
        "data_num_workers", "2",
        "output_dir", os.path.join(root, "out"),
        # bf16 train measured 2.7x on chip; params/ckpt stay f32 so the
        # trained tree is shared by both eval configs below
        "compute_dtype", "bfloat16",
        # 4x the reference lr/img: easy synthetic data favors a hotter
        # ADAM; the round-2 demo at the reference default needed 400
        # epochs to reach AP 0.5
        "scheduler", "fixed", "basic_lr_per_img", "6.25e-5",
    ])
    return exp


def ckpt_dir(root):
    return os.path.join(root, "out", "gen1_syolox_s", "ckpt", "best", "state")


# ---------------------------------------------------------------------------
# 3. eval one precision config (run in a subprocess)
# ---------------------------------------------------------------------------

F32_ENV = {
    "EAS_PLIF_FUSE": "0",
    "EAS_SPIKE_STORE": "float",
    "EAS_CONV_PLIF_FUSE": "0",
    "EAS_BN_AFFINE_FUSE": "0",
}


def run_eval(root, mode, batch, geom="tiny"):
    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.core.checkpoint import load_partial_params
    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    exp = build_exp(root, epochs=1, geom=geom)
    if mode == "deploy":
        exp.tpu_deploy()
    else:
        exp.merge([
            "compute_dtype", "float32", "packed_embedding", "never",
            "use_pallas", "never",
        ])
        exp.embedding_state_dtype = None  # f32 sampler carries

    model = exp.get_model()
    h, w = exp.test_size
    sample = jnp.zeros((1, exp.Tl, exp.Tm, h, w, exp.in_dim), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), sample, train=False
    )
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(ckpt_dir(root))
    params = restored.get("ema_params") or restored["params"]
    variables = dict(variables)
    variables["params"] = load_partial_params(variables["params"], params)
    variables["batch_stats"] = restored["batch_stats"]

    evaluator = exp.get_evaluator(batch_size=batch)
    ap, ap50, summary = exp.eval(model, variables, evaluator)
    print(summary, file=sys.stderr)
    print(json.dumps({"mode": mode, "ap": round(float(ap), 4),
                      "ap50": round(float(ap50), 4)}))


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def main():
    # long chip-bound run: make wedges diagnosable — SIGUSR2 dumps all
    # thread stacks to stderr without killing the process
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR2, all_threads=True)

    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ap_drift")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--geom", default="tiny", choices=["tiny", "flagship"],
                    help="flagship = the gen1_syolox_s preset's own "
                         "geometry (SYOLOX-S 256x320 T=3/Tm=4)")
    ap.add_argument("--phase", default=None,
                    help="internal: 'eval-f32' | 'eval-deploy'")
    args = ap.parse_args()

    if args.phase in ("eval-f32", "eval-deploy"):
        run_eval(args.root, args.phase.split("-", 1)[1], args.batch,
                 geom=args.geom)
        return

    make_data(args.root)

    if not args.skip_train or not os.path.isdir(ckpt_dir(args.root)):
        from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

        enable_compilation_cache()
        exp = build_exp(args.root, args.epochs, geom=args.geom)

        class TrainArgs:
            batch_size = args.batch
            resume = os.path.isdir(ckpt_dir(args.root))
            ckpt = None
            experiment_name = None
            grid_search = False
            profile = 0
            logger = "jsonl"

        exp.get_trainer(TrainArgs()).train()

    results = {}
    for phase in ("eval-f32", "eval-deploy"):
        env = dict(os.environ)
        if phase == "eval-f32":
            env.update(F32_ENV)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--root", args.root,
             "--batch", str(args.batch), "--geom", args.geom,
             "--phase", phase],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        sys.stderr.write(out.stderr[-2000:])
        if out.returncode != 0:
            raise SystemExit(f"{phase} failed:\n{out.stdout}\n{out.stderr}")
        results[phase.split("-", 1)[1]] = json.loads(
            out.stdout.strip().splitlines()[-1]
        )

    delta = {
        "ap_delta": round(results["deploy"]["ap"] - results["f32"]["ap"], 4),
        "ap50_delta": round(
            results["deploy"]["ap50"] - results["f32"]["ap50"], 4
        ),
    }
    summary = {"geom": args.geom, "f32": results["f32"],
               "deploy": results["deploy"], **delta}
    name = ("AP_DRIFT.json" if args.geom == "tiny"
            else "AP_DRIFT_FLAGSHIP.json")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), name), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
