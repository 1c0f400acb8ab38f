#!/usr/bin/env python3
"""Produce the checked-in reference-initialized flagship checkpoint.

The reference's model zoo (reference: yolox/models/build.py:36-111) loads
released ``.pth`` files by name; this environment has no egress, so the
zoo artifact is a checkpoint *initialized by the reference's own model
classes* — SpikingYOLOX(SpikingYOLOPAFPN + YOLOXHead + AdaptiveRSNNEmbedding)
at SYOLOX-S Gen1 geometry (reference: yolox/exp/event_yolox_base.py:161-211,
exps/default/e_yolox_s.py) — saved with the exact state-dict naming a real
trained reference checkpoint would carry (spikingjelly SeqToANNContainer
``.0.`` wrappers, ParametricLIFNode ``.w`` scalars, converted BatchNorm2d).

spikingjelly is not installed here, so this installs a FUNCTIONAL shim that
reproduces only the parameter/buffer *layout* of the three touched classes
(the artifact never runs a forward through them):
  - SeqToANNContainer(nn.Sequential): wrapped module becomes child "0"
  - ParametricLIFNode: one scalar param ``w = -log(init_tau - 1)``
  - layer.BatchNorm2d == nn.BatchNorm2d (+ step_mode kwarg)

Outputs (written into checkpoints/):
  syolox_s_gen1_init.pth          — torch state dict
  syolox_s_gen1_init.report.json  — translation report (must be 0 unmapped)

Usage: python tools/make_reference_ckpt.py [--out checkpoints/]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def install_functional_sj_shim():
    """Replace the inert test stub with layout-faithful torch classes."""
    import torch
    import torch.nn as nn

    sj = types.ModuleType("spikingjelly")
    ab = types.ModuleType("spikingjelly.activation_based")

    neuron = types.ModuleType("spikingjelly.activation_based.neuron")

    class BaseNode(nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

        def forward(self, x):  # layout-only shim; never exercised
            return x

    class LIFNode(BaseNode):
        pass

    class ParametricLIFNode(BaseNode):
        """Parameter layout of spikingjelly's ParametricLIFNode: a single
        scalar ``w`` with sigmoid(w) = 1/init_tau."""

        def __init__(self, init_tau=2.0, **kw):
            super().__init__()
            self.w = nn.Parameter(
                torch.as_tensor(-math.log(init_tau - 1.0))
            )

    neuron.BaseNode = BaseNode
    neuron.LIFNode = LIFNode
    neuron.ParametricLIFNode = ParametricLIFNode

    layer = types.ModuleType("spikingjelly.activation_based.layer")

    class SeqToANNContainer(nn.Sequential):
        pass

    class BatchNorm2d(nn.BatchNorm2d):
        def __init__(self, num_features, eps=1e-5, momentum=0.1,
                     step_mode="m"):
            super().__init__(num_features, eps=eps, momentum=momentum)

    layer.SeqToANNContainer = SeqToANNContainer
    layer.BatchNorm2d = BatchNorm2d

    surrogate = types.ModuleType("spikingjelly.activation_based.surrogate")

    class _Surrogate:
        def __init__(self, alpha=2.0, spiking=True):
            self.alpha = alpha

    surrogate.ATan = type("ATan", (_Surrogate,), {})
    surrogate.Sigmoid = type("Sigmoid", (_Surrogate,), {})

    functional = types.ModuleType(
        "spikingjelly.activation_based.functional"
    )
    functional.reset_net = lambda *a, **kw: None

    for name, mod in (
        ("neuron", neuron), ("layer", layer),
        ("surrogate", surrogate), ("functional", functional),
    ):
        setattr(ab, name, mod)
        sys.modules[f"spikingjelly.activation_based.{name}"] = mod
    sj.activation_based = ab
    sys.modules["spikingjelly"] = sj
    sys.modules["spikingjelly.activation_based"] = ab


def build_reference_model(seed=0):
    """SYOLOX-S Gen1 exactly as the reference's get_model assembles it
    (event_yolox_base.py:161-211) at the zoo spec geometry
    (models/build.py MODEL_SPECS['syolox-s-gen1'])."""
    import torch
    import torch.nn as nn

    sys.path.insert(0, "/root/repo/tests")
    from refutil import install_ref_stubs

    install_functional_sj_shim()  # before refutil's inert fallback
    install_ref_stubs()

    from yolox.models.activation import Rectangle
    from yolox.models.embedding import AdaptiveRSNNEmbedding
    from yolox.models.spiking_yolo_pafpn import SpikingYOLOPAFPN
    from yolox.models.spiking_yolox import SpikingYOLOX
    from yolox.models.yolo_head import YOLOXHead
    from yolox.utils.util import warp_decay

    torch.manual_seed(seed)
    T, TS, TM = 3, 3, 4
    kwargs_spikes = dict(
        nb_steps=TM, vreset=None, thresh=1.0, spike_fn=Rectangle,
        decay=nn.Parameter(warp_decay(0.5)), embedding="arsnn", Ts=TS,
        spike_attach=False,
    )
    embedding = AdaptiveRSNNEmbedding(
        kernel_size=5, in_channel=2, out_channel=2, readout="sum",
        split=False, write_zero=True, abs=False, depth=2, **kwargs_spikes,
    )
    in_channels = [256, 512, 1024]
    backbone = SpikingYOLOPAFPN(
        0.33, 0.50, in_channels=in_channels, in_dim=2, act="silu",
        spike_fn=Rectangle,
    )
    head = YOLOXHead(2, 0.50, in_channels=in_channels, act="silu")
    model = SpikingYOLOX(backbone, head, embedding, T=T)
    # init_yolo BN semantics (event_yolox_base.py:179-183)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.eps = 1e-3
            m.momentum = 0.03
    return model


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="checkpoints")
    args = p.parse_args()

    import torch

    model = build_reference_model()
    os.makedirs(args.out, exist_ok=True)
    pth = os.path.join(args.out, "syolox_s_gen1_init.pth")
    torch.save({"model": model.state_dict()}, pth)

    # Round-trip through our importer against the zoo model by name.
    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.models.build import create_model, load_weights

    ours = create_model("syolox-s-gen1")
    ev = jnp.zeros((1, 1, 4, 64, 64, 2), jnp.float32)
    variables = jax.jit(ours.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), ev, train=False
    )
    _, report = load_weights(variables, pth)
    with open(pth.replace(".pth", ".report.json"), "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps({"pth": pth, "report": report}))
    assert report["unmapped"] == 0, report


if __name__ == "__main__":
    main()
