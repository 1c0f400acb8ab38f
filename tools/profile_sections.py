#!/usr/bin/env python3
"""Sectional device-time profile of the flagship forward (SYOLOX-M Gen1).

Per-call wall clock is RTT-dominated on the axon relay (~32 ms floor), so
every section is timed by repeating it K times inside ONE jit (iterations
serialized through a scalar data dependence) and dividing by K, with a
K=1 run subtracted to cancel dispatch + transfer overhead:

    ms = (T(K) - T(1)) / (K - 1)

Sections: full forward, arsnn embedding, spiking backbone+FPN, head, plus
embedding dtype variants (f32 vs bf16 scan state).

Usage: python tools/profile_sections.py --batch 128 [--sections a,b,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = TS = 3
TM = 4
H, W = 256, 320


def _serialized_repeat(fn, K):
    """jit(fn applied K times), iterations chained by a scalar nudge so
    neither XLA CSE nor the relay can collapse repeats."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def rep(x):
        def body(c, _):
            out = fn(c)
            s = jax.tree_util.tree_reduce(
                lambda a, l: a + l.astype(jnp.float32).sum(),
                out, jnp.float32(0),
            )
            c2 = jax.tree_util.tree_map(
                lambda l: (l + (s * 1e-30).astype(l.dtype)), c
            )
            return c2, None

        c, _ = jax.lax.scan(body, x, None, length=K)
        return jax.tree_util.tree_reduce(
            lambda a, l: a + l.astype(jnp.float32).sum(), c, jnp.float32(0)
        )

    return rep


def device_ms(fn, x, K=8, rounds=3):
    """Per-application device ms via (T(K)-T(1))/(K-1), best of ``rounds``."""
    repK = _serialized_repeat(fn, K)
    rep1 = _serialized_repeat(fn, 1)
    float(repK(x))  # compile
    float(rep1(x))

    def best(f):
        ts = []
        for _ in range(rounds):
            t0 = time.perf_counter()
            float(f(x))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    tK, t1 = best(repK), best(rep1)
    return max((tK - t1) / (K - 1) * 1e3, 0.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--K", type=int, default=8)
    p.add_argument(
        "--sections", default="full,emb,backbone,head,emb_bf16,cost"
    )
    p.add_argument(
        "--state-dtype", default=None,
        help="sampler scan state dtype (bench.py deployment: bfloat16)",
    )
    p.add_argument(
        "--packed", action="store_true",
        help="space-to-depth packed sampler (bench.py deployment config)",
    )
    args = p.parse_args()
    B = args.batch
    sections = args.sections.split(",")

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model

    model = _build_model(
        depth=0.67, width=0.75, T=T, Ts=TS, Tm=TM, compute_dtype="bfloat16",
        state_dtype=args.state_dtype,
        packed="auto" if args.packed else "never",
    )
    rng = jax.random.PRNGKey(0)
    gen = jax.jit(
        lambda k: jax.random.poisson(k, 0.2, (B, 1, TM, H, W, 2)).astype(
            jnp.float32
        )
    )
    events = gen(rng)
    events.block_until_ready()
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, events[:1], train=False
    )

    out = {"batch": B, "K": args.K, "ms": {}}

    def full_fn(e):
        return model.apply(variables, e, train=False)

    def emb_fn(e):
        return model.apply(
            variables, e, train=False,
            method=lambda m, ev, train: m.emb(ev, train=train),
        )

    # backbone input: temporalized embedding output (T*B, H, W, 2)
    bb_in_shape = (T * B, H, W, 2)
    gen_bb = jax.jit(
        lambda k: jax.random.normal(k, bb_in_shape, jnp.float32)
    )
    bb_in = gen_bb(rng)
    bb_in.block_until_ready()

    def backbone_fn(x):
        return model.apply(
            variables, x, False,
            method=lambda m, xx, train: m.backbone(xx, train),
        )

    # head input: fpn outputs
    fpn_shapes = jax.eval_shape(backbone_fn, bb_in)
    gen_fpn = jax.jit(
        lambda k: tuple(
            jax.random.normal(jax.random.fold_in(k, i), s.shape, s.dtype)
            for i, s in enumerate(fpn_shapes)
        )
    )
    fpn_in = gen_fpn(rng)
    jax.block_until_ready(fpn_in)

    def head_fn(f):
        return model.apply(
            variables, f, train=False,
            method=lambda m, ff, train: m.head(ff, train=train),
        ).outputs

    def _cost(fn, x):
        comp = jax.jit(fn).lower(x).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        return {
            k: float(ca.get(k, 0.0))
            for k in ("flops", "bytes accessed")
            if ca and k in ca
        }

    if "cost" in sections:
        out["cost_analysis"] = {
            "full": _cost(full_fn, events),
            "emb": _cost(emb_fn, events),
            "backbone": _cost(backbone_fn, bb_in),
            "head": _cost(head_fn, fpn_in),
        }
        from eas_snn_tpu.evaluators.energy import conv_macs_per_frame

        out["conv_flops_frame"] = 2.0 * conv_macs_per_frame(
            model, tuple(events[:1].shape)
        )

    if "full" in sections:
        out["ms"]["full"] = round(device_ms(full_fn, events, args.K), 2)
    if "emb" in sections:
        out["ms"]["emb"] = round(device_ms(emb_fn, events, args.K), 2)
    if "backbone" in sections:
        out["ms"]["backbone"] = round(
            device_ms(backbone_fn, bb_in, args.K), 2
        )
    if "head" in sections:
        out["ms"]["head"] = round(device_ms(head_fn, fpn_in, args.K), 2)

    if "emb_bf16" in sections:
        # what if the WHOLE arsnn scan (state included) ran in bf16?
        def emb_bf16_fn(e):
            return model.apply(
                variables, e.astype(jnp.bfloat16), train=False,
                method=lambda m, ev, train: m.emb(ev, train=train),
            )

        out["ms"]["emb_bf16_state"] = round(
            device_ms(emb_bf16_fn, events, args.K), 2
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
