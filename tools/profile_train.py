#!/usr/bin/env python3
"""Sectional device-time profile of the flagship TRAIN step (SYOLOX-M Gen1).

Where does the backward go? Three value_and_grad variants are timed with
the same serialized-repeat trick as tools/profile_sections.py:

  grad_full          — loss + grad through the whole model
  grad_stop_emb      — stop_gradient after the ARSNN embedding: everything
                       except the embedding backward (its forward is paid)
  grad_stop_backbone — stop_gradient after the PAFPN: head+loss backward only
  fwd_loss           — loss forward alone

so  emb_bwd ≈ grad_full - grad_stop_emb,
    bb_bwd  ≈ grad_stop_emb - grad_stop_backbone.

Finer ablations (measurement-only env switches in models/):

  bn_frozen   — EAS_BN_FROZEN=1: BatchNorm uses running stats in train
                mode, removing the batch-stats reductions AND their
                backward. grad_full - bn_frozen bounds the stats cost.
  stop:dark3  — EAS_BB_STOP=dark3: stop_gradient after that backbone
                stage (stem|dark2..dark5). Ladder differences give
                per-stage backward cost:
                  stage_bwd(dark5) ≈ ms[stop:dark4] - ms[stop:dark5].

Usage: python tools/profile_train.py --batch 32 [--remat] [--K 4]
       python tools/profile_train.py --batch 128 --state-dtype bfloat16 \
           --packed auto --sections grad_full,bn_frozen,stop:dark3,...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_sections import device_ms  # noqa: E402

T = TS = 3
TM = 4
H, W = 256, 320


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--state-dtype", default=None)
    p.add_argument("--packed", default="never")
    p.add_argument(
        "--sections", default="fwd_loss,grad_full,grad_stop_emb,grad_stop_backbone"
    )
    args = p.parse_args()
    B = args.batch

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_model
    from eas_snn_tpu.models.simota import yolox_losses

    model = _build_model(
        depth=0.67, width=0.75, T=T, Ts=TS, Tm=TM, compute_dtype="bfloat16",
        state_dtype=args.state_dtype, packed=args.packed,
    )
    if args.remat:
        model = model.clone(remat=True)

    rng = jax.random.PRNGKey(0)
    gen = jax.jit(
        lambda k: jax.random.poisson(k, 0.2, (B, 1, TM, H, W, 2)).astype(
            jnp.float32
        )
    )
    events = gen(rng)
    events.block_until_ready()
    targets = jnp.tile(
        jnp.asarray([[1.0, 120.0, 110.0, 60.0, 40.0]], jnp.float32)[None],
        (B, 1, 1),
    )
    targets = jnp.concatenate(
        [targets, jnp.zeros((B, 9, 5), jnp.float32)], axis=1
    )
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, events[:1], targets[:1], train=True
    )
    params, stats = variables["params"], variables.get("batch_stats", {})

    def make_loss(stop_at: str):
        """stop_at: '' | 'emb' | 'backbone'."""

        def method(m, ev, tg, train):
            x = m.emb(ev, train=train)
            if stop_at == "emb":
                x = jax.lax.stop_gradient(x)
            x = m._temporalize(x)
            fpn = m.backbone(x, train)
            if stop_at == "backbone":
                fpn = jax.lax.stop_gradient(fpn)
            ho = m.head(fpn, train=train)
            losses = yolox_losses(
                ho.outputs, ho.origin_preds, tg, ho.grid_x, ho.grid_y,
                ho.strides, m.num_classes, use_l1=False,
            )
            return losses.total_loss

        def loss_fn(arg):
            # (params, events) both as ARGUMENTS: a closed-over batch at
            # B=128 is a 335 MB HLO constant and blows the relay's
            # remote-compile upload limit (HTTP 413)
            p, ev = arg
            out, _ = model.apply(
                {"params": p, "batch_stats": stats}, ev, targets,
                train=True, mutable=["batch_stats"], method=method,
            )
            return out

        return loss_fn

    # record EVERY config axis in the JSON: a measurement whose flags are
    # not in its output is uncomparable (round-5 lesson: ~50 ms of phantom
    # "regression" was two runs at different --state-dtype/--packed)
    out = {
        "batch": B, "K": args.K, "remat": args.remat,
        "state_dtype": args.state_dtype, "packed": args.packed,
        "env": {
            k: v for k, v in sorted(os.environ.items())
            if k.startswith("EAS_")
        },
        "ms": {},
    }
    secs = args.sections.split(",")
    arg0 = (params, events)

    def grad_of(loss_fn):
        def g(arg):
            p, ev = arg
            return jax.grad(lambda pp: loss_fn((pp, ev)))(p)

        return g

    if "fwd_loss" in secs:
        out["ms"]["fwd_loss"] = round(
            device_ms(make_loss(""), arg0, args.K), 2
        )
        print("fwd_loss", out["ms"]["fwd_loss"], flush=True)
    if "grad_full" in secs:
        out["ms"]["grad_full"] = round(
            device_ms(grad_of(make_loss("")), arg0, args.K), 2
        )
        print("grad_full", out["ms"]["grad_full"], flush=True)
    if "grad_stop_emb" in secs:
        out["ms"]["grad_stop_emb"] = round(
            device_ms(grad_of(make_loss("emb")), arg0, args.K), 2
        )
        print("grad_stop_emb", out["ms"]["grad_stop_emb"], flush=True)
    if "grad_stop_backbone" in secs:
        out["ms"]["grad_stop_backbone"] = round(
            device_ms(grad_of(make_loss("backbone")), arg0, args.K), 2
        )
    if "full_step" in secs:
        # the COMPLETE train step (grad + adam + EMA + batch-stats merge),
        # as bench_suite.bench_train times it — full_step - grad_full is
        # the non-gradient overhead of the step
        import optax

        from eas_snn_tpu.core.train_state import (
            create_train_state, train_step,
        )

        state0 = create_train_state(
            model, rng, events[:1], targets[:1], optax.adam(1e-4),
            use_ema=True,
        )

        def step_loss(arg):
            st, ev = arg
            new_state, m = train_step(st, ev, targets, use_l1=False,
                                      ema_decay=0.9998)
            # return the UPDATED params too — device_ms tree-reduces the
            # whole output, so the backward + optimizer stay live (a
            # loss-only return lets XLA dead-code-eliminate them and
            # times just the forward)
            return m["total_loss"], new_state.params

        out["ms"]["full_step"] = round(
            device_ms(step_loss, (state0, events), args.K), 2
        )
        print("full_step", out["ms"]["full_step"], flush=True)

    for sec in secs:
        env = None
        if sec == "bn_frozen":
            env = ("EAS_BN_FROZEN", "1")
        elif sec.startswith("stop:"):
            env = ("EAS_BB_STOP", sec.split(":", 1)[1])
        if env is None:
            continue
        os.environ[env[0]] = env[1]
        try:
            # fresh closure => fresh trace; the env switch is read at
            # trace time inside BatchNormFusable / CSPDarknet
            out["ms"][sec] = round(
                device_ms(grad_of(make_loss("")), arg0, args.K), 2
            )
            print(sec, out["ms"][sec], flush=True)
        finally:
            del os.environ[env[0]]

    ms = out["ms"]
    if "grad_full" in ms and "grad_stop_emb" in ms:
        out["derived_emb_bwd_ms"] = round(
            ms["grad_full"] - ms["grad_stop_emb"], 2
        )
    if "grad_stop_emb" in ms and "grad_stop_backbone" in ms:
        out["derived_backbone_bwd_ms"] = round(
            ms["grad_stop_emb"] - ms["grad_stop_backbone"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
