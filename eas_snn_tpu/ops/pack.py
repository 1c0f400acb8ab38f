"""Space-to-depth packing for small-channel stencil convs.

The ARSNN sampler's convs have C=2 in / C=4 out. In XLA's channels-last
TPU layout the channel dim rides the 128-wide lane axis, so every conv
operand AND every elementwise neuron-state tensor is physically padded
2->128: a ~64x memory blowup that makes the sampler ~half of the whole
detector's forward time. The standard TPU cure is space-to-depth: pack
b x b pixel blocks into channels (b=8 -> 128 input channels, full lanes),
and transform the conv weights so the packed conv computes EXACTLY the
original stencil:

  out[y, x, co] = sum_{dy, dx, ci} w[dy, dx, ci, co] * in[y+dy-p, x+dx-p, ci]

becomes a 3x3 conv over (H/b, W/b) blocks with (b*b*ci) -> (b*b*co)
channels, where each packed weight entry routes one original tap between
block positions. Zero SAME-padding is preserved (a zero block == b zero
pixel rows/cols, valid while p <= b). The transform is a pure
gather of the original weights — differentiable, so the packed path is
usable in training, not just eval.

Channel order within a packed pixel is CHANNEL-MAJOR: packed index
= c * b*b + (block_y * b + block_x). This keeps "split channels in half"
semantics intact — the ARSNN scan splits its conv output into gate/current
halves along channels, and c-major packing maps original channel halves to
packed channel halves.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "space_to_depth",
    "depth_to_space",
    "pack_conv_kernel",
    "pack_bias",
    "packable",
]


def packable(H: int, W: int, ksize: int, block: int) -> bool:
    return (
        H % block == 0 and W % block == 0 and ksize // 2 <= block
    )


def space_to_depth(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(..., H, W, C) -> (..., H/b, W/b, C*b*b), channel-major order."""
    *lead, H, W, C = x.shape
    b = block
    n = len(lead)
    x = x.reshape(*lead, H // b, b, W // b, b, C)
    # axes: lead..., Hb, by, Wb, bx, C  ->  lead..., Hb, Wb, C, by, bx
    perm = tuple(range(n)) + (n, n + 2, n + 4, n + 1, n + 3)
    x = jnp.transpose(x, perm)
    return x.reshape(*lead, H // b, W // b, C * b * b)


def depth_to_space(x: jnp.ndarray, block: int, channels: int) -> jnp.ndarray:
    """Inverse of space_to_depth (channel-major)."""
    *lead, Hb, Wb, _ = x.shape
    b = block
    n = len(lead)
    x = x.reshape(*lead, Hb, Wb, channels, b, b)
    # lead..., Hb, Wb, C, by, bx -> lead..., Hb, by, Wb, bx, C
    perm = tuple(range(n)) + (n, n + 3, n + 1, n + 4, n + 2)
    x = jnp.transpose(x, perm)
    return x.reshape(*lead, Hb * b, Wb * b, channels)


def _pack_index_map(ksize: int, ci: int, co: int, block: int):
    """Static scatter indices mapping original taps into the packed kernel.

    Returns (dst_idx (M, 4) int32, src_idx (M, 4) int32) with M = the
    number of (by, bx, dy, dx, ci, co) routes."""
    p = ksize // 2
    b = block
    dst, src = [], []
    for by in range(b):
        for bx in range(b):
            for dy in range(ksize):
                for dx in range(ksize):
                    oy, ox = by + dy - p, bx + dx - p
                    sy, sx = oy // b, ox // b          # block shift in {-1,0,1}
                    iy, ix = oy - sy * b, ox - sx * b  # within-block pos
                    for c_in in range(ci):
                        for c_out in range(co):
                            dst.append((
                                sy + 1, sx + 1,
                                c_in * b * b + (iy * b + ix),
                                c_out * b * b + (by * b + bx),
                            ))
                            src.append((dy, dx, c_in, c_out))
    return (
        np.asarray(dst, np.int32),
        np.asarray(src, np.int32),
    )


_INDEX_CACHE = {}


def pack_conv_kernel(k: jnp.ndarray, block: int) -> jnp.ndarray:
    """(kh, kw, ci, co) HWIO -> (3, 3, b*b*ci, b*b*co) packed HWIO.

    Pure gather/scatter of the original weights (differentiable)."""
    kh, kw, ci, co = k.shape
    b = block
    key = (kh, ci, co, b)
    if key not in _INDEX_CACHE:
        _INDEX_CACHE[key] = _pack_index_map(kh, ci, co, b)
    dst, src = _INDEX_CACHE[key]
    vals = k[src[:, 0], src[:, 1], src[:, 2], src[:, 3]]
    packed = jnp.zeros((3, 3, b * b * ci, b * b * co), k.dtype)
    return packed.at[dst[:, 0], dst[:, 1], dst[:, 2], dst[:, 3]].set(vals)


def pack_bias(bias: jnp.ndarray, block: int) -> jnp.ndarray:
    """(co,) -> (co*b*b,) channel-major: every block position gets the
    same bias."""
    return jnp.repeat(bias, block * block)
