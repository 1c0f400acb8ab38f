#!/usr/bin/env python3
"""Per-site A/B bench: whole-site fused conv+BN+PLIF kernel vs the
production unfused chain (XLA conv -> eval BN elementwise -> fused PLIF
kernel), at every spiking conv geometry of the flagship backbone
(SYOLOX-M, Gen1 256x320, T=3, B=128).

The whole-backbone composition measured a WASH (40.4 vs 41.5 ms), so the
byte win at some sites must be cancelled by losses at others; this tool
produces the per-geometry table that decides the fusion gate
(EAS_CONV_PLIF_FUSE / EAS_CONV_PLIF_MIN_COUT).

Timing: in-jit K-repeat with serialized iterations, (T(K)-T(1))/(K-1),
best of 3 — per-call wall clock is RTT-bound on the axon relay.

Usage: python tools/bench_conv_plif_sites.py [--batch 128] [--K 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = 3


def flagship_sites(B: int):
    """Spiking conv sites of CSPDarknet-M (width .75 -> base 48ch,
    depth .67 -> base_depth 2) at Gen1 256x320 input, one row per
    DISTINCT geometry with its multiplicity in the backbone+FPN.

    (name, ksize, stride, H, W, cins(tuple = virtual concat), cout, count)
    """
    s = []
    # stem Focus conv: 3x3 s1, 8 -> 48 @128x160 (bf16 input, not int8)
    s.append(("stem", 3, 1, 128, 160, (8,), 48, 1))
    # dark2: down 3x3 s2 48->96 @128x160; CSP(96, n=2)
    s.append(("dark2.down", 3, 2, 128, 160, (48,), 96, 1))
    s.append(("dark2.csp.conv12", 1, 1, 64, 80, (96,), 48, 2))
    s.append(("dark2.csp.m.conv1", 1, 1, 64, 80, (48,), 48, 2))
    s.append(("dark2.csp.m.conv2", 3, 1, 64, 80, (48,), 48, 2))
    s.append(("dark2.csp.conv3", 1, 1, 64, 80, (48, 48), 96, 1))
    # dark3: down 3x3 s2 96->192 @64x80; CSP(192, n=6)
    s.append(("dark3.down", 3, 2, 64, 80, (96,), 192, 1))
    s.append(("dark3.csp.conv12", 1, 1, 32, 40, (192,), 96, 2))
    s.append(("dark3.csp.m.conv1", 1, 1, 32, 40, (96,), 96, 6))
    s.append(("dark3.csp.m.conv2", 3, 1, 32, 40, (96,), 96, 6))
    s.append(("dark3.csp.conv3", 1, 1, 32, 40, (96, 96), 192, 1))
    # dark4: down 3x3 s2 192->384 @32x40; CSP(384, n=6)
    s.append(("dark4.down", 3, 2, 32, 40, (192,), 384, 1))
    s.append(("dark4.csp.conv12", 1, 1, 16, 20, (384,), 192, 2))
    s.append(("dark4.csp.m.conv1", 1, 1, 16, 20, (192,), 192, 6))
    s.append(("dark4.csp.m.conv2", 3, 1, 16, 20, (192,), 192, 6))
    s.append(("dark4.csp.conv3", 1, 1, 16, 20, (192, 192), 384, 1))
    # dark5: down 3x3 s2 384->768 @16x20; SPP; CSP(768, n=2, no shortcut)
    s.append(("dark5.down", 3, 2, 16, 20, (384,), 768, 1))
    s.append(("dark5.spp.conv1", 1, 1, 8, 10, (768,), 384, 1))
    s.append(("dark5.spp.conv2", 1, 1, 8, 10, (384,) * 4, 768, 1))
    s.append(("dark5.csp.conv12", 1, 1, 8, 10, (768,), 384, 2))
    s.append(("dark5.csp.m.conv1", 1, 1, 8, 10, (384,), 384, 2))
    s.append(("dark5.csp.m.conv2", 3, 1, 8, 10, (384,), 384, 2))
    s.append(("dark5.csp.conv3", 1, 1, 8, 10, (384, 384), 768, 1))
    return s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--K", type=int, default=8)
    p.add_argument("--only", default=None, help="substring filter on site name")
    args = p.parse_args()
    B = args.batch

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.ops import conv_plif_pallas as cpp
    from eas_snn_tpu.ops.plif_pallas import plif_fused
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_sections import device_ms

    rng = jax.random.PRNGKey(0)
    rows = []
    for name, k, stride, H, W, cins, cout, count in flagship_sites(B):
        if args.only and args.only not in name:
            continue
        cin = sum(cins)
        in_dt = jnp.bfloat16 if name == "stem" else jnp.int8
        keys = jax.random.split(jax.random.fold_in(rng, hash(name) % 2**31), 4)
        xs = tuple(
            (jax.random.uniform(jax.random.fold_in(keys[0], i),
                                (T * B, H, W, c)) < 0.2).astype(in_dt)
            for i, c in enumerate(cins)
        )
        x = xs[0] if len(xs) == 1 else xs
        wk = jax.random.normal(keys[1], (k, k, cin, cout), jnp.float32) * 0.1
        mul = jnp.ones((cout,), jnp.float32)
        bias = jax.random.normal(keys[2], (cout,), jnp.float32) * 0.01
        w_plif = jnp.float32(-1.386)  # sigmoid -> 0.2 decay

        if k == 1:
            w_oc = wk[0, 0].T  # (cout, cin)

            def fused(xx, w_oc=w_oc, bias=bias):
                return cpp.conv1x1_plif_fused(
                    xx, w_oc, bias, T, w_plif, out_dtype=jnp.int8)
            sup = cpp.conv1x1_plif_supported(
                tuple(t.shape for t in xs) if len(xs) > 1 else xs[0].shape,
                T, cout,
                tuple(t.dtype for t in xs) if len(xs) > 1 else xs[0].dtype)
        else:
            w3 = cpp.fold_conv3x3(wk, mul)

            def fused(xx, w3=w3, bias=bias, stride=stride):
                f = (cpp.conv3x3_plif_fused if stride == 1
                     else cpp.conv3x3s2_plif_fused)
                return f(xx, w3, bias, T, w_plif, out_dtype=jnp.int8)
            sup_f = (cpp.conv3x3_plif_supported if stride == 1
                     else cpp.conv3x3s2_plif_supported)
            sup = sup_f(xs[0].shape, T, cout, xs[0].dtype)

        khw = (k, k)

        def unfused(xx, wk=wk, bias=bias, kk=khw, stride=stride):
            xc = (jnp.concatenate(xx, axis=-1)
                  if isinstance(xx, (tuple, list)) else xx)
            pre = jax.lax.conv_general_dilated(
                xc.astype(jnp.bfloat16), wk.astype(jnp.bfloat16),
                (stride, stride), [((kk[0] - 1) // 2,) * 2] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            # eval BN normalize (mean=0, var=1 running stats) + bias
            pre = (pre.astype(jnp.float32) + bias).astype(jnp.bfloat16)
            return plif_fused(pre, T, w_plif, out_int8="direct")

        r = {"site": name, "k": k, "stride": stride, "HW": (H, W),
             "cin": cin, "cout": cout, "count": count, "supported": sup}
        r["unfused_ms"] = round(device_ms(unfused, x, args.K), 3)
        if sup:
            r["fused_ms"] = round(device_ms(fused, x, args.K), 3)
            r["win_ms_total"] = round(
                (r["unfused_ms"] - r["fused_ms"]) * count, 3)
        rows.append(r)
        print(json.dumps(r), flush=True)

    tot_u = sum(r["unfused_ms"] * r["count"] for r in rows)
    tot_f = sum(r.get("fused_ms", r["unfused_ms"]) * r["count"] for r in rows)
    best = sum(min(r["unfused_ms"], r.get("fused_ms", r["unfused_ms"]))
               * r["count"] for r in rows)
    print(json.dumps({"total_unfused_ms": round(tot_u, 2),
                      "total_fused_ms": round(tot_f, 2),
                      "total_best_ms": round(best, 2)}))


if __name__ == "__main__":
    main()
