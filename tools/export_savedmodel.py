#!/usr/bin/env python3
"""Export the eval forward as a TensorFlow SavedModel (serving artifact).

(reference: tools/export_onnx.py:1-116 / export_torchscript.py:1-80 — the
reference ships deployable artifacts via ONNX/TorchScript; the TPU-native
equivalents are StableHLO (tools/export_stablehlo.py, re-importable by any
XLA runtime) and this TF SavedModel: a `tf.saved_model` directory with the
weights stored as restorable ``tf.Variable``s — loadable by TF Serving,
``tf.saved_model.load``, or the TFLite converter.)

The trace is taken on the CPU platform so the exported module contains only
portable StableHLO (no TPU-only Pallas custom calls); it is lowered for every
platform in ``--platforms`` (default ``cpu,tpu``), so the same artifact serves
on either. Set ``EAS_EXPORT_REAL_DEVICE=1`` to trace on the ambient backend
instead (e.g. to bake in the TPU fast paths for a TPU-only artifact).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("eas_snn_tpu savedmodel export")
    p.add_argument("-n", "--name", type=str, default=None)
    p.add_argument("-f", "--exp_file", type=str, default=None)
    p.add_argument("-c", "--ckpt", type=str, default=None)
    p.add_argument("-o", "--output", type=str, default="model_savedmodel")
    p.add_argument("-b", "--batch-size", type=int, default=1)
    p.add_argument(
        "--platforms", type=str, default="cpu,tpu",
        help="comma-separated lowering targets for the serialized module",
    )
    p.add_argument(
        "--no-verify", action="store_true",
        help="skip the reload + numeric cross-check against the JAX forward",
    )
    p.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return p


def export_tf_savedmodel(model, variables, sample, out_dir,
                         platforms=("cpu", "tpu")):
    """Save ``model.apply(variables, ., train=False)`` as a SavedModel.

    Weights become ``tf.Variable``s (checkpointable, not baked constants);
    the serving signature is ``serve(events) -> predictions`` at the static
    shape of ``sample``. Returns the tf.Module that was saved.
    """
    import jax
    import tensorflow as tf
    from jax.experimental import jax2tf

    def forward(params, events):
        return model.apply(params, events, train=False)

    tf_fwd = jax2tf.convert(
        forward,
        native_serialization_platforms=tuple(platforms),
        with_gradient=False,
    )

    host_vars = jax.tree_util.tree_map(
        lambda a: tf.Variable(jax.device_get(a), trainable=False), variables
    )
    module = tf.Module()
    # tf.Module auto-tracks variables reachable from attributes
    module.params = host_vars
    module.serve = tf.function(
        lambda events: tf_fwd(host_vars, events),
        autograph=False,
        input_signature=[
            tf.TensorSpec(sample.shape, tf.as_dtype(str(sample.dtype)))
        ],
    )
    tf.saved_model.save(
        module, out_dir,
        signatures={"serving_default": module.serve},
    )
    return module


def main():
    args = make_parser().parse_args()

    if os.environ.get("EAS_EXPORT_REAL_DEVICE") != "1":
        # Trace on CPU so the module is portable StableHLO (the Pallas fast
        # paths gate on jax.default_backend() at trace time).
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eas_snn_tpu.exp import get_exp

    exp = get_exp(args.exp_file, args.name)
    if args.opts:
        exp.merge(args.opts)

    model = exp.get_model()
    h, w = exp.test_size
    sample = jnp.zeros(
        (args.batch_size, exp.Tl, exp.Tm, h, w, exp.in_dim), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(exp.seed or 0), sample,
                           train=False)
    if args.ckpt:
        import orbax.checkpoint as ocp

        from eas_snn_tpu.core.checkpoint import load_partial_params

        restored = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.ckpt)
        )
        params = restored.get("ema_params") or restored.get("params", restored)
        variables = dict(variables)
        variables["params"] = load_partial_params(variables["params"], params)

    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    export_tf_savedmodel(model, variables, sample, args.output, platforms)
    size = sum(
        os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(args.output) for f in fs
    )
    print(f"exported SavedModel: {args.output}/ ({size / 1e6:.1f} MB, "
          f"platforms={','.join(platforms)})")

    if not args.no_verify:
        import tensorflow as tf

        reloaded = tf.saved_model.load(args.output)
        x = np.random.default_rng(0).normal(size=sample.shape).astype(
            np.float32
        )
        got = np.asarray(reloaded.serve(tf.constant(x)))
        want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        err = float(np.max(np.abs(got - want)))
        assert err < 1e-4, f"reloaded SavedModel diverges: max|diff|={err:.3e}"
        print(f"verify: reloaded serve() matches JAX forward "
              f"(max|diff|={err:.1e})")


if __name__ == "__main__":
    main()
