"""Headline benchmark: SYOLOX-M Gen1-geometry forward throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures end-to-end eval-forward event-frames/sec (one event frame = one
labeled detection sample: Tl=1 macro slice x Tm=4 micro-steps at Gen1
240x304 letterboxed to 256x320, arsnn sampler Ts=T=3, spiking backbone,
analog FPN/head — the reference's headline Gen1 config, readme.md:124-146).

``vs_baseline`` is the ratio against the PyTorch reference measured on this
host if ``BASELINE_MEASURED.json`` exists (created by
``tools/measure_torch_baseline.py``), else null.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model

    T = Ts = 3
    Tm = 4
    B, H, W = 8, 256, 320
    model = _build_model(depth=0.67, width=0.75, T=T, Ts=Ts, Tm=Tm)

    rng = jax.random.PRNGKey(0)
    events_host = np.random.default_rng(0).poisson(
        0.2, size=(B, 1, Tm, H, W, 2)
    ).astype(np.float32)
    events = jnp.asarray(events_host)
    variables = model.init(rng, events[:1], train=False)

    @jax.jit
    def fwd(variables, events):
        return model.apply(variables, events, train=False)

    # warmup/compile
    jax.block_until_ready(fwd(variables, events))

    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, events)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = B * n_iters / dt

    vs_baseline = None
    base_path = os.path.join(os.path.dirname(__file__), "BASELINE_MEASURED.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        ref_fps = base.get("torch_frames_per_sec")
        if ref_fps:
            vs_baseline = fps / ref_fps

    print(
        json.dumps(
            {
                "metric": "event_frames_per_sec_per_chip",
                "value": round(fps, 2),
                "unit": "frames/s (SYOLOX-M Gen1 T=3 eval forward, batch 8)",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
