"""Deployment-artifact export tests.

Covers both TPU-native serving surfaces (reference: tools/export_onnx.py /
export_torchscript.py — the artifact formats differ, the capability is the
same):

- StableHLO via ``jax.export``: serialize -> deserialize -> call roundtrip
  (tools/export_stablehlo.py's path).
- TF SavedModel via ``jax2tf``: save -> ``tf.saved_model.load`` -> serve()
  numeric equality against the JAX forward, with weights as tf.Variables
  (tools/export_savedmodel.py). Skipped when tensorflow is absent.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eas_snn_tpu.models import EASYOLOX

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def _tiny_model():
    return EASYOLOX(
        num_classes=2, depth=0.33, width=0.125, T=2,
        use_spike="backbone", embedding="arsnn", embedding_ksize=3,
        embedding_depth=1, Ts=2, readout="sum", write_zero=True,
        spike_fn="atan", alpha=2.0, thresh=1.0, vreset=None,
    )


@pytest.fixture(scope="module")
def tiny():
    model = _tiny_model()
    sample = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 1, 3, 64, 64, 2))
        .astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    want = np.asarray(model.apply(variables, sample, train=False))
    return model, variables, sample, want


def test_stablehlo_export_roundtrip(tiny):
    from jax import export as jexport

    model, variables, sample, want = tiny

    def forward(events):
        return model.apply(variables, events, train=False)

    exported = jexport.export(jax.jit(forward))(
        jax.ShapeDtypeStruct(sample.shape, sample.dtype)
    )
    blob = exported.serialize()
    assert len(blob) > 0
    assert "stablehlo" in exported.mlir_module()

    reloaded = jexport.deserialize(blob)
    got = np.asarray(reloaded.call(sample))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_tf_savedmodel_export(tiny, tmp_path):
    tf = pytest.importorskip("tensorflow")
    # import by file path: the reference-parity tests put /root/reference
    # on sys.path, whose tools/ is a REGULAR package (has __init__.py)
    # that shadows our namespace-package tools/ for the rest of the session
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "eas_export_savedmodel",
        os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                     "export_savedmodel.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    export_tf_savedmodel = mod.export_tf_savedmodel

    model, variables, sample, want = tiny
    out = str(tmp_path / "sm")
    export_tf_savedmodel(model, variables, sample, out, platforms=("cpu",))

    reloaded = tf.saved_model.load(out)
    got = np.asarray(reloaded.serve(tf.constant(np.asarray(sample))))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    # weights are checkpointable variables, not baked constants
    n_vars = len(reloaded.params["params"]) if isinstance(
        reloaded.params, dict) else 0
    assert n_vars > 0
