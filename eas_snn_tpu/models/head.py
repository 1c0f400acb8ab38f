"""Decoupled anchor-free YOLOX detection head, NHWC Flax.

Covers the reference's ``YOLOXHead`` and ``SpikingYOLOXHead`` with one module
(reference: yolox/models/yolo_head.py, spiking_yolo_head.py:18-270):
  * analog mode — input features are (B, H, W, C);
  * spiking-input mode (``decode_input=True``) — features arrive as
    (T*B, H, W, C) spike trains and are rate-decoded before the stem
    (spiking_yolo_head.py:159-160);
  * full-spike mode (``neuron.spiking``) — all head convs are spiking and the
    *predictions* are rate-decoded (spiking_yolo_head.py:175-178).

The head returns decoded per-anchor outputs plus the grid/stride tables;
losses live in simota.py (pure functions, vmapped over the batch).
"""

from __future__ import annotations

from math import log
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, DWConv, NeuronCfg
from .pafpn import rate_decode

__all__ = ["YOLOXHead", "HeadOutput"]


class HeadOutput(NamedTuple):
    outputs: jnp.ndarray        # (B, A, 5+C) decoded (train) or activated (eval)
    origin_preds: Optional[jnp.ndarray]  # (B, A, 4) raw reg, train only
    grid_x: jnp.ndarray         # (A,)
    grid_y: jnp.ndarray         # (A,)
    strides: jnp.ndarray        # (A,)
    hw: Tuple[Tuple[int, int], ...]


def _bias_init_prior(prior_prob: float):
    """Focal-style bias init for cls/obj preds (reference :135-146)."""
    b = -log((1 - prior_prob) / prior_prob)
    return lambda key, shape, dtype=jnp.float32: jnp.full(shape, b, dtype)


class YOLOXHead(nn.Module):
    num_classes: int
    width: float = 1.0
    strides: Tuple[int, ...] = (8, 16, 32)
    in_channels: Tuple[int, ...] = (256, 512, 1024)
    act: str = "silu"
    depthwise: bool = False
    neuron: NeuronCfg = NeuronCfg.ann()   # spiking head convs (full_spike)
    dtype: object = None                  # compute dtype (None -> float32)
    decode_input: bool = False            # rate-decode (T*B,...) inputs
    T: int = 1                            # time steps when decoding in/out
    prior_prob: float = 1e-2

    @nn.compact
    def __call__(
        self,
        xin: Sequence[jnp.ndarray],
        train: bool = False,
    ) -> HeadOutput:
        Conv = DWConv if self.depthwise else BaseConv
        hidden = int(256 * self.width)
        import jax.numpy as _jnp
        dt = self.dtype or _jnp.float32
        kw = dict(act=self.act, neuron=self.neuron, dtype=dt)

        outputs = []
        origin_preds = []
        grid_xs, grid_ys, stride_vec, hw = [], [], [], []
        for k, (stride, x) in enumerate(zip(self.strides, xin)):
            if self.decode_input and not self.neuron.spiking:
                x = rate_decode(x, self.T)  # (B, H, W, C)
            x = BaseConv(hidden, 1, 1, name=f"stem{k}", **kw)(x, train)

            cls_feat = Conv(hidden, 3, 1, name=f"cls_conv{k}_0", **kw)(x, train)
            cls_feat = Conv(hidden, 3, 1, name=f"cls_conv{k}_1", **kw)(cls_feat, train)
            cls_out = nn.Conv(
                self.num_classes, (1, 1), name=f"cls_pred{k}",
                bias_init=_bias_init_prior(self.prior_prob), dtype=dt,
            )(cls_feat).astype(jnp.float32)

            reg_feat = Conv(hidden, 3, 1, name=f"reg_conv{k}_0", **kw)(x, train)
            reg_feat = Conv(hidden, 3, 1, name=f"reg_conv{k}_1", **kw)(reg_feat, train)
            reg_out = nn.Conv(4, (1, 1), name=f"reg_pred{k}", dtype=dt)(
                reg_feat).astype(jnp.float32)
            obj_out = nn.Conv(
                1, (1, 1), name=f"obj_pred{k}",
                bias_init=_bias_init_prior(self.prior_prob), dtype=dt,
            )(reg_feat).astype(jnp.float32)

            if self.neuron.spiking:
                # full-spike: rate-decode the predictions (:175-178)
                cls_out = rate_decode(cls_out, self.T)
                reg_out = rate_decode(reg_out, self.T)
                obj_out = rate_decode(obj_out, self.T)

            B, H, W, _ = reg_out.shape
            hw.append((H, W))
            yv, xv = jnp.meshgrid(
                jnp.arange(H, dtype=jnp.float32),
                jnp.arange(W, dtype=jnp.float32),
                indexing="ij",
            )
            gx = xv.reshape(-1)
            gy = yv.reshape(-1)
            grid_xs.append(gx)
            grid_ys.append(gy)
            stride_vec.append(jnp.full((H * W,), stride, jnp.float32))

            out = jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
            out = out.reshape(B, H * W, -1)
            if train:
                # decode xy/wh into image units (reference :232-250)
                xy = (out[..., :2] + jnp.stack([gx, gy], -1)[None]) * stride
                wh = jnp.exp(out[..., 2:4]) * stride
                out = jnp.concatenate([xy, wh, out[..., 4:]], axis=-1)
                origin_preds.append(reg_out.reshape(B, H * W, 4))
            else:
                out = jnp.concatenate(
                    [
                        out[..., :4],
                        jax.nn.sigmoid(out[..., 4:5]),
                        jax.nn.sigmoid(out[..., 5:]),
                    ],
                    axis=-1,
                )
            outputs.append(out)

        all_out = jnp.concatenate(outputs, axis=1)   # (B, A, 5+C)
        gx = jnp.concatenate(grid_xs)
        gy = jnp.concatenate(grid_ys)
        sv = jnp.concatenate(stride_vec)

        if not train:
            # decode eval outputs (reference decode_outputs :252-270)
            xy = (all_out[..., :2] + jnp.stack([gx, gy], -1)[None]) * sv[None, :, None]
            wh = jnp.exp(all_out[..., 2:4]) * sv[None, :, None]
            all_out = jnp.concatenate([xy, wh, all_out[..., 4:]], axis=-1)
            return HeadOutput(all_out, None, gx, gy, sv, tuple(hw))

        origin = jnp.concatenate(origin_preds, axis=1)
        return HeadOutput(all_out, origin, gx, gy, sv, tuple(hw))
