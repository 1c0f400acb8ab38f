"""CSPDarknet backbone (reference: yolox/models/darknet.py:97-180), NHWC Flax.

Size is controlled by (dep_mul, wid_mul) exactly as the reference; spiking
behaviour comes from ``NeuronCfg`` (see blocks.py) instead of module surgery.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv, Focus, NeuronCfg, SPPBottleneck

__all__ = ["CSPDarknet"]


class CSPDarknet(nn.Module):
    dep_mul: float
    wid_mul: float
    out_features: Tuple[str, ...] = ("dark3", "dark4", "dark5")
    depthwise: bool = False
    act: str = "silu"
    neuron: NeuronCfg = NeuronCfg.ann()
    dtype: object = jnp.float32
    # block-granular rematerialization: wrap every stage conv / CSP layer in
    # nn.remat so the backward pass holds at most ONE block's internal
    # activations at a time (whole-module remat saves almost nothing — the
    # recompute re-materializes everything at once; measured 13.89 -> 13.59
    # GB at B=64, vs block remat which is what lets B=128 train fit HBM)
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        base_ch = int(self.wid_mul * 64)
        base_depth = max(round(self.dep_mul * 3), 1)
        Conv = DWConv if self.depthwise else BaseConv
        CSPLayer_, SPPBottleneck_, Focus_ = CSPLayer, SPPBottleneck, Focus
        if self.remat:
            Conv = nn.remat(Conv, static_argnums=(2,))
            CSPLayer_ = nn.remat(CSPLayer, static_argnums=(2,))
            SPPBottleneck_ = nn.remat(SPPBottleneck, static_argnums=(2,))
            Focus_ = nn.remat(Focus, static_argnums=(2,))
        kw = dict(act=self.act, neuron=self.neuron, dtype=self.dtype)

        # measurement-only ablation (tools/profile_train.py): stop the
        # backward after this stage — together with the stop_emb/
        # stop_backbone ladder this localizes per-stage backward cost.
        bb_stop = os.environ.get("EAS_BB_STOP", "")

        def _stage(outputs, x, name):
            outputs[name] = x
            if name == bb_stop:
                x = jax.lax.stop_gradient(x)
                outputs = {
                    k: jax.lax.stop_gradient(v) for k, v in outputs.items()
                }
            return outputs, x

        outputs = {}
        # The reference's convert_to_spiking wraps the Focus stem WHOLE in a
        # SeqToANNContainer without recursing into it (utils_snn.py:22-24),
        # so the stem's activation stays analog SiLU even in spiking mode —
        # only dark2..dark5 get PLIF neurons. Mirror that: stem is always ANN.
        stem_kw = dict(kw, neuron=NeuronCfg.ann())
        x = Focus_(base_ch, ksize=3, name="stem", **stem_kw)(x, train)
        outputs, x = _stage(outputs, x, "stem")

        x = Conv(base_ch * 2, 3, 2, name="dark2_conv", **kw)(x, train)
        x = CSPLayer_(
            base_ch * 2, n=base_depth, depthwise=self.depthwise, name="dark2_csp", **kw
        )(x, train)
        outputs, x = _stage(outputs, x, "dark2")

        x = Conv(base_ch * 4, 3, 2, name="dark3_conv", **kw)(x, train)
        x = CSPLayer_(
            base_ch * 4, n=base_depth * 3, depthwise=self.depthwise,
            name="dark3_csp", **kw,
        )(x, train)
        outputs, x = _stage(outputs, x, "dark3")

        x = Conv(base_ch * 8, 3, 2, name="dark4_conv", **kw)(x, train)
        x = CSPLayer_(
            base_ch * 8, n=base_depth * 3, depthwise=self.depthwise,
            name="dark4_csp", **kw,
        )(x, train)
        outputs, x = _stage(outputs, x, "dark4")

        x = Conv(base_ch * 16, 3, 2, name="dark5_conv", **kw)(x, train)
        x = SPPBottleneck_(base_ch * 16, name="dark5_spp", **kw)(x, train)
        x = CSPLayer_(
            base_ch * 16, n=base_depth, shortcut=False, depthwise=self.depthwise,
            name="dark5_csp", **kw,
        )(x, train)
        outputs, x = _stage(outputs, x, "dark5")

        return {k: v for k, v in outputs.items() if k in self.out_features}
