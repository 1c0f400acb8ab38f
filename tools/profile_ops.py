#!/usr/bin/env python3
"""Op-level (HLO) profile of the flagship train/eval step via xprof.

Captures a ``jax.profiler.trace`` of K serialized executions and parses
the resulting ``*.xplane.pb`` with xprof's converter into per-HLO-op
device times, printing the top-N ops with their category and share.
This is the attribution tool behind the train-backward work: the
sectional ladder (tools/profile_train.py) says WHICH stage is slow,
this says WHICH HLO ops inside it.

Usage:
  python tools/profile_ops.py --batch 128 --state-dtype bfloat16 \
      --packed auto --top 40 [--mode grad|fwd|step] [--json out.json]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T = TS = 3
TM = 4
H, W = 256, 320


def parse_xplane(logdir: str, top: int):
    """Return [(op_name, category, total_us, share)] sorted by time."""
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.xplane.pb")))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", "replace")
    tbl = json.loads(data)
    # hlo_stats is a GViz DataTable: {cols: [...], rows: [{c: [{v:..}]}]}
    cols = [c.get("label") or c.get("id") for c in tbl["cols"]]

    def col(*names):
        for n in names:
            if n in cols:
                return cols.index(n)
        return None

    i_name = col("HLO expression", "hlo_op_expression", "HLO op expression",
                 "hlo_op_name", "HLO op name")
    i_cat = col("HLO op category", "hlo_category", "category")
    i_us = col("Total time (us)", "total_time_us", "Total time in us",
               "occurrences * avg. time (us)")
    i_self = col("Total self time (us)", "total_self_time_us")
    i_t = i_self if i_self is not None else i_us
    rows = []
    for r in tbl["rows"]:
        c = r["c"]

        def v(i):
            return c[i]["v"] if i is not None and c[i] else None

        rows.append((str(v(i_name))[:160], v(i_cat), float(v(i_t) or 0.0)))
    rows.sort(key=lambda x: -x[2])
    tot = sum(r[2] for r in rows) or 1.0
    return [(n, cat, us, us / tot) for n, cat, us in rows[:top]], tot, cols


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--K", type=int, default=3)
    p.add_argument("--state-dtype", default="bfloat16")
    p.add_argument("--packed", default="auto")
    p.add_argument("--mode", default="grad", choices=["grad", "fwd", "step"])
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--json", default=None)
    p.add_argument("--logdir", default=None)
    p.add_argument("--parse-only", default=None,
                   help="skip capture; parse this logdir")
    args = p.parse_args()

    if args.parse_only:
        report(args, args.parse_only)
        return

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from eas_snn_tpu.models.simota import yolox_losses

    B = args.batch
    model = _build_model(
        depth=0.67, width=0.75, T=T, Ts=TS, Tm=TM,
        compute_dtype="bfloat16", state_dtype=args.state_dtype,
        packed=args.packed,
    )
    rng = jax.random.PRNGKey(0)
    events = jax.jit(
        lambda k: jax.random.poisson(k, 0.2, (B, 1, TM, H, W, 2)).astype(
            jnp.float32)
    )(rng)
    events.block_until_ready()
    targets = jnp.tile(
        jnp.asarray([[1.0, 120.0, 110.0, 60.0, 40.0]], jnp.float32)[None],
        (B, 1, 1))
    targets = jnp.concatenate(
        [targets, jnp.zeros((B, 9, 5), jnp.float32)], axis=1)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, events[:1], targets[:1], train=True)
    params, stats = variables["params"], variables.get("batch_stats", {})

    # same composition as profile_train.make_loss("")
    def method(m, ev, tg, train):
        x = m.emb(ev, train=train)
        x = m._temporalize(x)
        fpn = m.backbone(x, train)
        ho = m.head(fpn, train=train)
        losses = yolox_losses(
            ho.outputs, ho.origin_preds, tg, ho.grid_x, ho.grid_y,
            ho.strides, m.num_classes, use_l1=False)
        return losses.total_loss

    def loss(p_, ev):
        out, _ = model.apply(
            {"params": p_, "batch_stats": stats}, ev, targets,
            train=True, mutable=["batch_stats"], method=method)
        return out

    if args.mode == "fwd":
        fn = jax.jit(loss)
    else:
        fn = jax.jit(lambda p_, ev: jax.grad(loss)(p_, ev))

    print("compiling...", flush=True)
    r = fn(params, events)
    jax.block_until_ready(r)
    print("compiled; tracing", flush=True)

    logdir = args.logdir or tempfile.mkdtemp(prefix="easprof_")
    with jax.profiler.trace(logdir):
        for _ in range(args.K):
            r = fn(params, events)
        jax.block_until_ready(r)
    print("logdir:", logdir, flush=True)
    report(args, logdir)


def report(args, logdir):
    rows, tot_us, cols = parse_xplane(logdir, args.top)
    print(f"total device op time: {tot_us/1000:.2f} ms "
          f"(K={args.K} steps summed)")
    print(f"{'us':>10}  {'share':>6}  {'category':<22} op")
    for n, cat, us, share in rows:
        print(f"{us:10.0f}  {share:6.1%}  {str(cat):<22} {n}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"total_us": tot_us, "cols": cols,
                       "top": [list(r) for r in rows]}, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
