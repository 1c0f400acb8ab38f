"""Legacy YOLOv3-style Darknet backbone + FPN.

(reference: yolox/models/darknet.py:10-95 Darknet-21/53 and
yolox/models/yolo_fpn.py:12-84 YOLOFPN — kept by the reference for the
yolov3 exps; provided here for the same legacy presets.)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, SPPBottleneck, upsample2x

__all__ = ["Darknet", "YOLOFPN"]


class _ResBlock(nn.Module):
    """Two 1x1/3x3 convs with an additive shortcut (reference ResLayer,
    network_blocks.py:107-122)."""

    channels: int
    act: str = "lrelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.channels // 2
        y = BaseConv(mid, 1, 1, act=self.act, name="layer1")(x, train)
        y = BaseConv(self.channels, 3, 1, act=self.act, name="layer2")(y, train)
        return x + y


class Darknet(nn.Module):
    """Darknet-21/53 (depth selects the per-stage block counts;
    reference darknet.py:10-95)."""

    depth: int = 21
    in_channels: int = 3
    stem_out_channels: int = 32
    out_features: Tuple[str, ...] = ("dark3", "dark4", "dark5")

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        assert self.depth in (21, 53), "supported depths: 21, 53"
        num_blocks = {21: (1, 2, 2, 1), 53: (2, 8, 8, 4)}[self.depth]
        act = "lrelu"
        c = self.stem_out_channels

        def group(x, ch, n_blocks, stride, name):
            x = BaseConv(ch, 3, stride, act=act, name=f"{name}_down")(x, train)
            for i in range(n_blocks):
                x = _ResBlock(ch, act=act, name=f"{name}_res{i}")(x, train)
            return x

        outputs = {}
        x = BaseConv(c, 3, 1, act=act, name="stem_conv")(x, train)
        x = group(x, c * 2, 1, 2, "stem_res")
        outputs["stem"] = x
        x = group(x, c * 4, num_blocks[0], 2, "dark2")
        outputs["dark2"] = x
        x = group(x, c * 8, num_blocks[1], 2, "dark3")
        outputs["dark3"] = x
        x = group(x, c * 16, num_blocks[2], 2, "dark4")
        outputs["dark4"] = x
        x = group(x, c * 32, num_blocks[3], 2, "dark5")
        # spp tail (reference make_spp_block, darknet.py:68-83):
        # 1x1 down, 3x3 up, SPPBottleneck, 3x3 up, 1x1 down
        x = BaseConv(c * 16, 1, 1, act=act, name="dark5_spp0")(x, train)
        x = BaseConv(c * 32, 3, 1, act=act, name="dark5_spp1")(x, train)
        x = SPPBottleneck(out_channels=c * 16, act=act, name="dark5_spp2")(
            x, train
        )
        x = BaseConv(c * 32, 3, 1, act=act, name="dark5_spp3")(x, train)
        x = BaseConv(c * 16, 1, 1, act=act, name="dark5_spp4")(x, train)
        outputs["dark5"] = x
        return {k: v for k, v in outputs.items() if k in self.out_features}


class YOLOFPN(nn.Module):
    """YOLOv3 top-down FPN over Darknet features (reference
    yolo_fpn.py:12-84): 1x1 lateral + upsample + concat + 2-conv embed."""

    depth: int = 53
    in_features: Tuple[str, ...] = ("dark3", "dark4", "dark5")

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = Darknet(
            depth=self.depth, out_features=self.in_features, name="backbone"
        )(x, train)
        x2, x1, x0 = (feats[f] for f in self.in_features)

        def embed(x, ch, name):
            # reference _make_embedding (yolo_fpn.py:42-51): 5 convs 1-3-1-3-1
            x = BaseConv(ch, 1, 1, act="lrelu", name=f"{name}_0")(x, train)
            x = BaseConv(ch * 2, 3, 1, act="lrelu", name=f"{name}_1")(x, train)
            x = BaseConv(ch, 1, 1, act="lrelu", name=f"{name}_2")(x, train)
            x = BaseConv(ch * 2, 3, 1, act="lrelu", name=f"{name}_3")(x, train)
            x = BaseConv(ch, 1, 1, act="lrelu", name=f"{name}_4")(x, train)
            return x

        # yolo branch 1 (dark5 -> dark4 merge)
        lat0 = BaseConv(256, 1, 1, act="lrelu", name="out1_cbl")(x0, train)
        m1 = jnp.concatenate([upsample2x(lat0), x1], axis=-1)
        out_dark4 = embed(m1, 256, "out1")

        # yolo branch 2 (-> dark3 merge)
        lat1 = BaseConv(128, 1, 1, act="lrelu", name="out2_cbl")(out_dark4, train)
        m2 = jnp.concatenate([upsample2x(lat1), x2], axis=-1)
        out_dark3 = embed(m2, 128, "out2")

        return (out_dark3, out_dark4, x0)
