#!/usr/bin/env python3
"""Measure the reference PyTorch implementation's forward throughput on this
host and cache it for bench.py's ``vs_baseline``.

What runs: the reference's own modules (AdaptiveRSNNEmbedding + YOLOPAFPN +
YOLOXHead from /root/reference) at the same Gen1 geometry bench.py uses.
Torch in this environment is CPU-only and spikingjelly is absent, so this is
the reference's ANN detector behind its arsnn sampler — the closest runnable
configuration — measured on CPU. The resulting ratio is therefore
"TPU chip vs reference-on-host-CPU", NOT vs the paper's GPUs; the JSON
records that caveat.
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stub_modules():
    for name in ("loguru",):
        if name not in sys.modules:
            fake = types.ModuleType(name)

            class _L:
                def __getattr__(self, k):
                    return lambda *a, **kw: None

            fake.logger = _L()
            sys.modules[name] = fake
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(batched_nms=None, nms=None)
        sys.modules["torchvision"] = tv
    if "spikingjelly" not in sys.modules:
        sj = types.ModuleType("spikingjelly")
        ab = types.ModuleType("spikingjelly.activation_based")

        class _Any(types.ModuleType):
            def __getattr__(self, k):
                if k.startswith("__"):
                    raise AttributeError(k)  # don't fabricate dunders
                return type(k, (), {"__init__": lambda s, *a, **kw: None})

        for n in ("neuron", "functional", "layer", "surrogate"):
            mod = _Any(f"spikingjelly.activation_based.{n}")
            setattr(ab, n, mod)
            sys.modules[f"spikingjelly.activation_based.{n}"] = mod
        sj.activation_based = ab
        sys.modules["spikingjelly"] = sj
        sys.modules["spikingjelly.activation_based"] = ab


def main():
    import numpy as np
    import torch

    _stub_modules()
    sys.path.insert(0, "/root/reference")
    from yolox.models.activation import Rectangle
    from yolox.models.embedding import AdaptiveRSNNEmbedding
    from yolox.models.yolo_head import YOLOXHead
    from yolox.models.yolo_pafpn import YOLOPAFPN

    torch.set_num_threads(os.cpu_count() or 8)
    B, Tm, H, W = 8, 4, 256, 320
    emb = AdaptiveRSNNEmbedding(
        kernel_size=5, Ts=3, depth=2, readout="sum", write_zero=True,
        nb_steps=Tm, thresh=1.0, vreset=None, spike_fn=Rectangle,
    ).eval()
    back = YOLOPAFPN(0.67, 0.75, in_dim=2).eval()
    head = YOLOXHead(2, 0.75).eval()

    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.poisson(0.2, (B, 1, Tm, 2, H, W)).astype(np.float32)
    )

    def fwd():
        with torch.inference_mode():
            z = emb(x)            # (Ts, B, 2, H, W)
            outs = []
            for t in range(z.shape[0]):
                outs.append(head(list(back(z[t]))))
            return torch.stack(outs).mean(0)

    fwd()  # warmup
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        fwd()
    dt = time.perf_counter() - t0
    fps = B * n / dt
    out = {
        "torch_frames_per_sec": round(fps, 3),
        "config": (
            "reference AdaptiveRSNNEmbedding + YOLOPAFPN(0.67,0.75) + "
            "YOLOXHead, T=3 (per-slice ANN forward), Gen1 256x320, batch 8"
        ),
        "caveat": (
            "torch CPU on this host (no GPU, no spikingjelly); NOT the "
            "paper's GPU baseline"
        ),
        "threads": torch.get_num_threads(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
