"""Measured engagement policy for the whole-site conv+BN+PLIF kernels.

The fused kernels (ops/conv_plif_pallas.py) remove the bf16 preactivation
round-trip, but their lanes=T*B formulation pays per-pixel matmul
serialization — so whether a site wins depends on its geometry, not on a
single channel threshold. tools/bench_conv_plif_sites.py measured every
spiking conv geometry of the flagship (SYOLOX-M, Gen1 256x320, T=3,
B=128) fused vs the production unfused chain on a v5e chip (2026-08-18):

    site               k s  HxW     cin->cout  unfused  fused   verdict
    stem               3 1  128x160   8->48     4.506    4.931  lose
    dark2.csp.conv12   1 1  64x80    96->48     1.840    1.546  WIN
    dark2.csp.m.conv1  1 1  64x80    48->48     0.743    1.241  lose
    dark2.csp.m.conv2  3 1  64x80    48->48     1.045    2.103  lose
    dark2.csp.conv3    1 1  64x80   2x48->96    2.531    2.227  WIN
    dark3.csp.conv12   1 1  32x40   192->96     0.373    0.502  lose
    dark3.csp.m.conv1  1 1  32x40    96->96     0.184    0.337  lose
    dark3.csp.m.conv2  3 1  32x40    96->96     0.854    0.689  WIN (x6)
    dark3.csp.conv3    1 1  32x40   2x96->192   1.094    0.856  WIN
    dark4.csp.conv12   1 1  16x20   384->192    0.341    0.175  WIN
    dark4.csp.m.conv1  1 1  16x20   192->192    0.145    0.278  lose
    dark4.csp.m.conv2  3 1  16x20   192->192    0.448    0.526  lose
    dark4.csp.conv3    1 1  16x20  2x192->384   0.651    0.481  WIN
    dark5.spp.conv1    1 1  8x10    768->384    0.021    0.242  noise
    dark5.spp.conv2    1 1  8x10   4x384->768   0.628    0.652  tie
    dark5.csp.conv12   1 1  8x10    768->384    0.096    0.000  noise
    dark5.csp.m.conv1  1 1  8x10    384->384    0.128    0.033  noise
    dark5.csp.m.conv2  3 1  8x10    384->384    0.403    0.408  tie
    dark5.csp.conv3    1 1  8x10   2x384->768   0.278    0.149  WIN
    dark2.down         3 2  128x160  48->96     4.134    3.923  WIN
    dark3.down         3 2  64x80    96->192    2.103    2.169  tie
    dark4.down         3 2  32x40   192->384    1.436    1.460  tie
    dark5.down         3 2  16x20   384->768    1.101    1.071  tie

(The stride-2 downsamples were VMEM-inadmissible at the original fixed
ho_blk=4; the block size is now fitted to the 80 MB estimate — hb=2 at
every flagship downsample geometry — and all four were measured
2026-08-19. Only dark2.down wins reproducibly: 0.21/0.35 ms across two
runs; the deeper downsamples are byte-light enough that the fused
per-pixel dots only break even.)

Fusing everything measured a WASH at the backbone level (41.9 vs 38.8 ms
summed; 40.4 vs 41.5 composed) because the early-stage losses cancel the
merge-site wins; per-site selection gives the 35.7 ms optimum. The
policy below encodes exactly the decisive winners (sites whose unfused
time is above the ~0.4 ms measurement noise floor and whose fused win is
reproducible); unknown geometries default to NOT fusing.

A/B control (env EAS_CONV_PLIF_FUSE, read at trace time):
  'auto' (default) — this measured table;
  '1'  — fuse every supported site;  '0' — never fuse;
  '1x1' / '3x3' — fuse every supported site of that kernel size.
"""

from __future__ import annotations

import os

__all__ = ["should_fuse"]

# (ksize, stride, H_in, W_in, n_pieces, cin_total, cout) -> fuse.
# Entries are batch-size independent (the supported() gates already
# require B % 128 == 0); spatial keys scale with the input resolution,
# so they hold for the Gen1 256x320 flagship geometry they were
# measured at.
_MEASURED_WINS = {
    (1, 1, 64, 80, 1, 96, 48),     # dark2 CSP conv1/conv2 (reduce)
    (1, 1, 64, 80, 2, 96, 96),     # dark2 CSP conv3 (virtual concat)
    (3, 1, 32, 40, 1, 96, 96),     # dark3 bottleneck conv2 (x6)
    (1, 1, 32, 40, 2, 192, 192),   # dark3 CSP conv3
    (1, 1, 16, 20, 1, 384, 192),   # dark4 CSP conv1/conv2
    (1, 1, 16, 20, 2, 384, 384),   # dark4 CSP conv3
    (1, 1, 8, 10, 2, 768, 768),    # dark5 CSP conv3
    (3, 2, 128, 160, 1, 48, 96),   # dark2 downsample (hb=2 VMEM fit)
}


def should_fuse(ksize: int, stride: int, shapes, cout: int) -> bool:
    """Policy decision for one conv site at trace time.

    ``shapes``: the input shape (T*B, H, W, C) or a tuple of them (a
    virtual channel concat). Callers check kernel support separately.
    """
    pol = os.environ.get("EAS_CONV_PLIF_FUSE", "auto")
    if pol == "0":
        return False
    if pol == "1":
        return True
    if pol in ("1x1", "3x3"):
        return pol == f"{ksize}x{ksize}"
    # 'auto': the measured table
    pieces = shapes if isinstance(shapes[0], (tuple, list)) else (shapes,)
    key = (
        ksize, stride, pieces[0][1], pieces[0][2], len(pieces),
        sum(s[3] for s in pieces), cout,
    )
    return key in _MEASURED_WINS
