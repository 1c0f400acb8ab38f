#!/usr/bin/env python3
"""Export the eval forward to StableHLO text + a serialized jax export blob.

(reference: tools/export_onnx.py / export_torchscript.py — the TPU-native
deployment artifact is StableHLO via ``jax.export``: portable across XLA
runtimes and re-importable with ``jax.export.deserialize``.)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("eas_snn_tpu export")
    p.add_argument("-n", "--name", type=str, default=None)
    p.add_argument("-f", "--exp_file", type=str, default=None)
    p.add_argument("-c", "--ckpt", type=str, default=None)
    p.add_argument("-o", "--output", type=str, default="model_stablehlo")
    p.add_argument("-b", "--batch-size", type=int, default=1)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p


def main():
    args = make_parser().parse_args()

    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from eas_snn_tpu.exp import get_exp

    exp = get_exp(args.exp_file, args.name)
    if args.opts:
        exp.merge(args.opts)

    model = exp.get_model()
    h, w = exp.test_size
    sample = jnp.zeros(
        (args.batch_size, exp.Tl, exp.Tm, h, w, exp.in_dim), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(exp.seed or 0), sample, train=False)
    if args.ckpt:
        import orbax.checkpoint as ocp

        from eas_snn_tpu.core.checkpoint import load_partial_params

        restored = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
        params = restored.get("ema_params") or restored.get("params", restored)
        variables = dict(variables)
        variables["params"] = load_partial_params(variables["params"], params)

    def forward(events):
        return model.apply(variables, events, train=False)

    exported = jexport.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(sample.shape, sample.dtype)
    )
    blob = exported.serialize()
    with open(args.output + ".bin", "wb") as f:
        f.write(blob)
    with open(args.output + ".mlir", "w") as f:
        f.write(exported.mlir_module())
    print(
        f"exported StableHLO: {args.output}.bin "
        f"({len(blob) / 1e6:.1f} MB) + {args.output}.mlir"
    )


if __name__ == "__main__":
    main()
