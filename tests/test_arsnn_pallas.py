"""Equivalence of the Pallas-fused ARSNN sampler vs the XLA scan
(interpret mode on the CPU test platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eas_snn_tpu.ops.arsnn import arsnn_scan
from eas_snn_tpu.ops.arsnn_pallas import arsnn_scan_fused
from eas_snn_tpu.ops.surrogate import get_spike_fn


def make_convs(rng, cin, cout, ksize=3):
    k1 = jax.random.normal(rng, (ksize, ksize, cin, 2 * cout)) * 0.5
    k2 = jax.random.normal(
        jax.random.fold_in(rng, 1), (ksize, ksize, cout, 2 * cout)
    ) * 0.5
    pad = [(ksize // 2,) * 2] * 2

    def input_conv(x):
        return jax.lax.conv_general_dilated(
            x, k1.astype(x.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def gate_conv(x):
        return jax.lax.conv_general_dilated(
            x, k2.astype(x.dtype), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    return input_conv, gate_conv


@pytest.mark.parametrize("readout", ["sum", "last", "avg"])
@pytest.mark.parametrize("write_zero,spike_attach", [(False, False), (True, True)])
def test_fused_matches_scan(readout, write_zero, spike_attach):
    rng = jax.random.PRNGKey(0)
    Tm, N, H, W, C = 5, 2, 8, 8, 2
    events = jax.random.normal(rng, (Tm, N, H, W, C)) * 2.0
    input_conv, gate_conv = make_convs(jax.random.fold_in(rng, 7), C, C)
    kw = dict(
        Ts=3, thresh=1.0, vreset=None,
        spike_fn=get_spike_fn("rect", 1.0),
        readout=readout, spike_attach=spike_attach, write_zero=write_zero,
    )
    ref = arsnn_scan(events, input_conv, gate_conv, **kw)
    fused = arsnn_scan_fused(
        events, input_conv, gate_conv, interpret=True, **kw
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_fused_hard_reset():
    rng = jax.random.PRNGKey(3)
    Tm, N, H, W, C = 4, 1, 6, 6, 2
    events = jax.random.normal(rng, (Tm, N, H, W, C)) * 2.0
    input_conv, gate_conv = make_convs(jax.random.fold_in(rng, 9), C, C)
    kw = dict(
        Ts=2, thresh=1.0, vreset=0.0,
        spike_fn=get_spike_fn("rect", 1.0), readout="sum",
        spike_attach=False, write_zero=False,
    )
    ref = arsnn_scan(events, input_conv, gate_conv, **kw)
    fused = arsnn_scan_fused(events, input_conv, gate_conv, interpret=True, **kw)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def make_weighted_convs(rng, cin, cout, ksize=3, depth=2):
    """Depth-stacked conv weights + matching XLA closures (conv-ReLU-conv)."""
    pad = [(ksize // 2,) * 2] * 2
    weights = []
    key = rng
    dims_in = [(cin, 2 * cout)] + [(2 * cout, 2 * cout)] * (depth - 1)
    for i, (ci, co) in enumerate(dims_in):
        key = jax.random.fold_in(key, i)
        k = jax.random.normal(key, (ksize, ksize, ci, co)) * 0.4
        b = jax.random.normal(jax.random.fold_in(key, 99), (co,)) * 0.1
        weights.append((k, b))

    def apply(x, ws):
        for i, (k, b) in enumerate(ws):
            if i > 0:
                x = jax.nn.relu(x)
            x = jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(x.dtype)
        return x

    return weights, lambda x: apply(x, weights)


class TestFusedV2:
    @pytest.mark.parametrize("readout", ["sum", "last", "avg"])
    @pytest.mark.parametrize(
        "write_zero,vreset", [(False, None), (True, 0.0)]
    )
    def test_v2_matches_scan(self, readout, write_zero, vreset):
        from eas_snn_tpu.ops.arsnn_pallas import arsnn_fused_v2

        rng = jax.random.PRNGKey(5)
        Tm, N, H, W, C = 4, 2, 16, 12, 2
        events = jax.random.normal(rng, (Tm, N, H, W, C)) * 2.0
        iw, input_conv = make_weighted_convs(
            jax.random.fold_in(rng, 1), C, C, ksize=3, depth=2
        )
        gw, gate_conv = make_weighted_convs(
            jax.random.fold_in(rng, 2), C, C, ksize=3, depth=2
        )
        kw = dict(
            Ts=3, thresh=1.0, vreset=vreset, readout=readout,
            spike_attach=True, write_zero=write_zero,
        )
        ref = arsnn_scan(
            events, input_conv, gate_conv,
            spike_fn=get_spike_fn("rect", 1.0), **kw,
        )
        fused = arsnn_fused_v2(
            events, iw, gw, interpret=True, **kw,
        )
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-4
        )

    def test_v2_depth1_ksize5(self):
        from eas_snn_tpu.ops.arsnn_pallas import arsnn_fused_v2

        rng = jax.random.PRNGKey(8)
        Tm, N, H, W, C = 3, 1, 16, 17, 2
        events = jax.random.normal(rng, (Tm, N, H, W, C)) * 2.0
        iw, input_conv = make_weighted_convs(
            jax.random.fold_in(rng, 1), C, C, ksize=5, depth=1
        )
        gw, gate_conv = make_weighted_convs(
            jax.random.fold_in(rng, 2), C, C, ksize=5, depth=1
        )
        kw = dict(
            Ts=2, thresh=1.0, vreset=None, readout="sum",
            spike_attach=False, write_zero=True,
        )
        ref = arsnn_scan(
            events, input_conv, gate_conv,
            spike_fn=get_spike_fn("rect", 1.0), **kw,
        )
        fused = arsnn_fused_v2(events, iw, gw, interpret=True, **kw)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-4
        )


def test_embedding_use_pallas_always_matches_default():
    """ARSNNEmbedding(use_pallas='always') routes through the v2 kernel and
    must produce the XLA scan's forward values (interpret mode on CPU)."""
    from eas_snn_tpu.models.embedding import ARSNNEmbedding

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 4, 16, 24, 2)) * 2.0
    kw = dict(ksize=5, depth=2, Ts=3, readout="sum", spike_attach=True,
              write_zero=True, thresh=1.0, vreset=None)
    base = ARSNNEmbedding(**kw)
    fused = ARSNNEmbedding(use_pallas="always", **kw)
    variables = base.init(jax.random.PRNGKey(0), x)
    a = base.apply(variables, x)
    b = fused.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5
    )
