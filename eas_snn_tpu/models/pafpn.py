"""YOLO-PAFPN neck over CSPDarknet features (reference:
yolox/models/yolo_pafpn.py:12-117, spiking variant spiking_yolo_pafpn.py:14-121).

One module covers all reference variants via two NeuronCfg flags:
  * ``backbone_neuron`` — spiking backbone ('use_spike=True' mode) or analog;
  * ``neck_neuron`` — spiking FPN convs ('full_spike' modes) or analog.
When the backbone is spiking but the neck is not, backbone features are
rate-decoded (mean over T) before the neck, exactly at the reference's decode
point (spiking_yolo_pafpn.py:98).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv, NeuronCfg, upsample2x
from .darknet import CSPDarknet

__all__ = ["YOLOPAFPN"]


def rate_decode(x: jnp.ndarray, T: int) -> jnp.ndarray:
    """(T*B, H, W, C) -> (B, H, W, C) firing-rate decode (mean over T)."""
    return x.reshape((T, -1) + x.shape[1:]).mean(axis=0)


class YOLOPAFPN(nn.Module):
    depth: float = 1.0
    width: float = 1.0
    in_features: Tuple[str, ...] = ("dark3", "dark4", "dark5")
    in_channels: Tuple[int, int, int] = (256, 512, 1024)
    depthwise: bool = False
    act: str = "silu"
    backbone_neuron: NeuronCfg = NeuronCfg.ann()
    neck_neuron: NeuronCfg = NeuronCfg.ann()
    # block-granular remat: forwarded to CSPDarknet and applied to every
    # neck conv/CSP block (see darknet.py — whole-module remat is useless)
    remat: bool = False
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        feats = CSPDarknet(
            self.depth,
            self.width,
            out_features=self.in_features,
            depthwise=self.depthwise,
            act=self.act,
            neuron=self.backbone_neuron,
            dtype=self.dtype,
            remat=self.remat,
            name="backbone",
        )(x, train)
        features = [feats[f] for f in self.in_features]
        if self.backbone_neuron.spiking and not self.neck_neuron.spiking:
            # rate decode before the analog neck (spiking_yolo_pafpn.py:98)
            features = [rate_decode(f, self.backbone_neuron.T) for f in features]
        x2, x1, x0 = features

        w = self.width
        c0, c1, c2 = (int(c * w) for c in self.in_channels)
        n = round(3 * self.depth)
        Conv = DWConv if self.depthwise else BaseConv
        BaseConv_, CSPLayer_ = BaseConv, CSPLayer
        if self.remat:
            Conv = nn.remat(Conv, static_argnums=(2,))
            BaseConv_ = nn.remat(BaseConv, static_argnums=(2,))
            CSPLayer_ = nn.remat(CSPLayer, static_argnums=(2,))
        kw = dict(act=self.act, neuron=self.neck_neuron, dtype=self.dtype)
        csp_kw = dict(shortcut=False, depthwise=self.depthwise, **kw)

        # merge points hand CSPLayer a TUPLE (unmaterialized channel
        # concat): its 1x1 conv1/conv2 fold the pieces into the fused
        # conv+BN+PLIF kernel at eval; the unfused path concatenates inside
        # BaseConv with identical semantics.
        fpn_out0 = BaseConv_(c1, 1, 1, name="lateral_conv0", **kw)(x0, train)
        f_out0 = (upsample2x(fpn_out0), x1)
        f_out0 = CSPLayer_(c1, n=n, name="C3_p4", **csp_kw)(f_out0, train)

        fpn_out1 = BaseConv_(c0, 1, 1, name="reduce_conv1", **kw)(f_out0, train)
        f_out1 = (upsample2x(fpn_out1), x2)
        pan_out2 = CSPLayer_(c0, n=n, name="C3_p3", **csp_kw)(f_out1, train)

        p_out1 = Conv(c0, 3, 2, name="bu_conv2", **kw)(pan_out2, train)
        pan_out1 = CSPLayer_(c1, n=n, name="C3_n3", **csp_kw)(
            (p_out1, fpn_out1), train)

        p_out0 = Conv(c1, 3, 2, name="bu_conv1", **kw)(pan_out1, train)
        pan_out0 = CSPLayer_(c2, n=n, name="C3_n4", **csp_kw)(
            (p_out0, fpn_out0), train)

        return (pan_out2, pan_out1, pan_out0)
