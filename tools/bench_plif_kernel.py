#!/usr/bin/env python3
"""Standalone roofline bench of the fused PLIF kernel's forward + backward
at every flagship (SYOLOX-M, B=128) spiking-site geometry.

The round-5 HLO profile attributed 65.7 ms/step of the flagship train step
to PLIF custom-calls (100 calls, fwd+bwd) against a ~22 ms byte roofline —
this tool measures each geometry's fwd and VJP device time standalone so
kernel variants (block shape, aliasing, surrogate arithmetic) can be
A/B'd per site.

Usage: python tools/bench_plif_kernel.py [--rows 512] [--K 8] [--geos all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_sections import device_ms  # noqa: E402

# (TB, H, W, C) at SYOLOX-M (depth .67 width .75), 256x320, T=3, B=128
FLAGSHIP_GEOS = {
    "stem": (384, 128, 160, 48),
    "dark2.down": (384, 64, 80, 96),
    "dark2.csp1x1": (384, 64, 80, 48),
    "dark3.down": (384, 32, 40, 192),
    "dark3.csp1x1": (384, 32, 40, 96),
    "dark4.down": (384, 16, 20, 384),
    "dark4.csp1x1": (384, 16, 20, 192),
    "dark5.down": (384, 8, 10, 768),
    "dark5.csp1x1": (384, 8, 10, 384),
}
# how many times each geometry class appears in the flagship model
# (approximate multiplicities for extrapolation; CSP stacks repeat m-blocks)
PEAK_GBPS = 819.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--rows", type=int, default=0,
                   help="override _MAX_ROWS (0 = library default)")
    p.add_argument("--geos", default="all")
    p.add_argument("--json", default=None)
    args = p.parse_args()

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.ops import plif_pallas

    if args.rows:
        plif_pallas._MAX_ROWS = args.rows

    T = 3
    names = (list(FLAGSHIP_GEOS) if args.geos == "all"
             else args.geos.split(","))
    out = {"rows": args.rows or plif_pallas._MAX_ROWS, "K": args.K,
           "sites": {}}
    for name in names:
        TB, Hh, Ww, C = FLAGSHIP_GEOS[name]
        elems = TB * Hh * Ww * C
        x = jax.jit(lambda k: jax.random.normal(
            k, (TB, Hh, Ww, C), jnp.bfloat16))(jax.random.PRNGKey(0))
        w = jnp.zeros((), jnp.float32)

        def fwd(arg):
            xx, ww = arg
            return plif_pallas.plif_fused(xx, T, ww, out_int8="view")

        def vjp(arg):
            xx, ww = arg
            def loss(x_, w_):
                return plif_pallas.plif_fused(
                    x_, T, w_, out_int8="view").astype(jnp.float32).sum()
            return jax.grad(loss, argnums=(0, 1))(xx, ww)

        ms_f = device_ms(fwd, (x, w), args.K)
        ms_b = device_ms(vjp, (x, w), args.K)
        # fwd bytes: read bf16 x + write int8 spikes = 3 B/elem
        # bwd bytes: total - fwd (the VJP runs fwd+bwd): bwd kernel reads
        # x (2) + g (2) + writes dx (2) = 6 B/elem; the .sum() cotangent
        # is a broadcast constant XLA materializes as g — count it.
        roof_f = elems * 3 / PEAK_GBPS / 1e6
        roof_b = elems * (3 + 6) / PEAK_GBPS / 1e6
        out["sites"][name] = {
            "elems": elems, "fwd_ms": round(ms_f, 3),
            "fwd_roof_ms": round(roof_f, 3),
            "vjp_ms": round(ms_b, 3), "vjp_roof_ms": round(roof_b, 3),
        }
        print(f"{name:14s} fwd {ms_f:7.3f} ms (roof {roof_f:6.3f})  "
              f"vjp {ms_b:7.3f} ms (roof {roof_b:6.3f})", flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
