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
