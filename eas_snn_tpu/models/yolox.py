"""Assembled event detectors: embedding -> (spiking|analog) PAFPN -> head.

One module covers the reference's four ``use_spike`` variants
(reference: yolox/exp/event_yolox_base.py:197-214):

  * ``use_spike='none'``  — YOLOX: analog backbone+head; a multi-slice
    embedding output keeps only slice 0 (reference yolox.py:39-40).
  * ``use_spike='backbone'`` ('True' in reference) — spiking CSPDarknet,
    analog FPN + head, rate decode after the backbone.
  * ``use_spike='full'`` ('full_spike') — spiking backbone+FPN, analog head
    over rate-decoded features.
  * ``use_spike='full_v2'`` ('full_spike_v2') — fully spiking head too;
    predictions are rate-decoded.

Temporal contract (reference spiking_yolox.py:38-57): the embedding emits
either a single frame (broadcast to T SNN steps) or Ts slices with Ts == T.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import NeuronCfg
from .embedding import build_embedding
from .head import HeadOutput, YOLOXHead
from .pafpn import YOLOPAFPN
from .simota import YoloxLossOutput, yolox_losses

__all__ = ["EASYOLOX", "ModelConfig"]

USE_SPIKE_MODES = ("none", "backbone", "full", "full_v2")


class EASYOLOX(nn.Module):
    num_classes: int = 2
    depth: float = 0.33
    width: float = 0.50
    act: str = "silu"
    use_spike: str = "backbone"
    T: int = 3
    spike_fn: str = "atan"
    alpha: float = 2.0
    # ASGL ('patan') knobs: hard/smooth mixing prob and learnable-alpha
    # granularity ('layer' | 'channel' | 'neuron') — see NeuronCfg
    asgl_p: float = 0.0
    alpha_granularity: str = "layer"
    # when set (any non-None value), a BatchNorm over the 2 polarity
    # channels follows the embedding; with a multi-slice embedding only
    # slice 0 survives, exactly like the reference's ModuleList wrap
    # (reference: yolox/exp/event_yolox_base.py:188-192 + the x[0] slice
    # in yolox.py:30-36 / spiking_yolox.py:41-47)
    norm: Optional[str] = None
    depthwise: bool = False
    # embedding knobs (see build_embedding)
    embedding: str = "arsnn"
    embedding_ksize: int = 5
    embedding_depth: int = 1
    Ts: int = 1
    readout: str = "sum"
    spike_attach: bool = False
    write_zero: bool = False
    use_abs: bool = False
    split: bool = False
    thresh: float = 1.0
    vreset: Optional[float] = 0.0
    decay: float = 0.5
    # 'float32' | 'bfloat16' — conv/BN compute dtype for the backbone, neck
    # and head (params and losses stay float32; bf16 feeds the MXU at 2x)
    compute_dtype: str = "float32"
    # block-granular rematerialization: every backbone/neck conv + CSP
    # block recomputes its internal activations in the backward pass, so
    # peak activation memory holds one block at a time plus block-boundary
    # features (whole-module remat measured useless: 13.89 -> 13.59 GB at
    # B=64; block remat is what lets flagship B>=128 train steps fit HBM)
    remat: bool = False
    # 'never' | 'auto' | 'always' — route the ARSNN embedding's eval
    # forward through the whole-scan-resident Pallas kernel
    # (ops/arsnn_pallas.py:arsnn_fused_v2) when the geometry supports it
    use_pallas: str = "never"
    # 'never' | 'auto': space-to-depth packed ARSNN scan (ops/pack.py)
    packed_embedding: str = "never"
    # None (f32) | 'bfloat16' — ARSNN scan state dtype (halves the
    # bandwidth-bound sampler's carry traffic; elementwise deviation)
    embedding_state_dtype: Optional[str] = None

    def setup(self):
        assert self.use_spike in USE_SPIKE_MODES, self.use_spike
        spiking = self.use_spike != "none"

        def _snn():
            return NeuronCfg.snn(self.T, self.spike_fn, self.alpha,
                                 self.asgl_p, self.alpha_granularity)

        bb_neuron = _snn() if spiking else NeuronCfg.ann()
        neck_neuron = (
            _snn() if self.use_spike in ("full", "full_v2")
            else NeuronCfg.ann()
        )
        head_neuron = (
            _snn() if self.use_spike == "full_v2" else NeuronCfg.ann()
        )
        import jax.numpy as _jnp

        emb_dt = (
            _jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        )
        self.emb = build_embedding(
            self.embedding,
            dtype=emb_dt,
            ksize=self.embedding_ksize,
            depth=self.embedding_depth,
            Ts=self.Ts,
            readout=self.readout,
            spike_attach=self.spike_attach,
            write_zero=self.write_zero,
            use_abs=self.use_abs,
            split=self.split,
            thresh=self.thresh,
            vreset=self.vreset,
            decay=self.decay,
            use_pallas=self.use_pallas,
            packed=self.packed_embedding,
            state_dtype=self.embedding_state_dtype,
            remat=self.remat,
        )
        import jax.numpy as jnp_

        dt = jnp_.bfloat16 if self.compute_dtype == "bfloat16" else jnp_.float32
        if self.norm is not None:
            from .blocks import BatchNormFusable

            # BatchNorm2d(2) after the embedding; init_yolo retunes every
            # BN to eps=1e-3 / torch momentum 0.03 (flax 0.97)
            # (reference event_yolox_base.py:179-183, 188-192)
            self.emb_bn = BatchNormFusable(
                momentum=0.97, epsilon=1e-3, dtype=dt, name="emb_bn")
        self.backbone = YOLOPAFPN(
            remat=self.remat,
            depth=self.depth,
            width=self.width,
            depthwise=self.depthwise,
            act=self.act,
            backbone_neuron=bb_neuron,
            neck_neuron=neck_neuron,
            dtype=dt,
        )
        # heads consume (T*B) features when the neck is spiking
        self.head = YOLOXHead(
            num_classes=self.num_classes,
            width=self.width,
            act=self.act,
            depthwise=self.depthwise,
            neuron=head_neuron,
            dtype=dt,
            decode_input=(self.use_spike == "full"),
            T=self.T,
        )

    def _temporalize(self, x: jnp.ndarray) -> jnp.ndarray:
        """Embedding output -> (T*B, H, W, C) for the spiking backbone
        (reference spiking_yolox.py:52-57)."""
        if x.ndim == 4:  # single frame -> broadcast over T
            x = jnp.broadcast_to(x[None], (self.T,) + x.shape)
        elif x.shape[0] == 1:
            x = jnp.broadcast_to(x, (self.T,) + x.shape[1:])
        else:
            assert x.shape[0] == self.T, (
                f"embedding emitted {x.shape[0]} slices but T={self.T}"
            )
        return x.reshape((-1,) + x.shape[2:])

    def __call__(
        self,
        events: jnp.ndarray,
        targets: Optional[jnp.ndarray] = None,
        train: bool = False,
        use_l1: bool = False,
    ):
        emb_kwargs = (
            {"train": train} if self.embedding == "arsnn" else {}
        )
        x = self.emb(events, **emb_kwargs)
        if self.norm is not None:
            # the reference's ModuleList wrap slices to the first frame
            # BEFORE the BN (dim > 4 check, spiking_yolox.py:41-47), so a
            # multi-slice embedding loses its extra slices under norm
            if x.ndim > 4:
                x = x[0]
            x = self.emb_bn(x.astype(self.emb_bn.dtype), train)
        if self.use_spike == "none":
            if x.ndim > 4:
                x = x[0]  # keep first slice (reference yolox.py:39-40)
        else:
            x = self._temporalize(x)
        fpn_outs = self.backbone(x, train)
        head_out: HeadOutput = self.head(fpn_outs, train=train)

        if targets is not None and train:
            losses: YoloxLossOutput = yolox_losses(
                head_out.outputs,
                head_out.origin_preds,
                targets,
                head_out.grid_x,
                head_out.grid_y,
                head_out.strides,
                self.num_classes,
                use_l1=use_l1,
            )
            return {
                "total_loss": losses.total_loss,
                "iou_loss": losses.iou_loss,
                "conf_loss": losses.conf_loss,
                "cls_loss": losses.cls_loss,
                "l1_loss": losses.l1_loss,
                "num_fg": losses.num_fg,
            }
        return head_out.outputs
