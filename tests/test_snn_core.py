"""Unit tests for surrogate gradients, LIF dynamics, and the ARSNN sampler.

The reference has no numerical tests for its SNN math (SURVEY.md §4); these
golden-value and oracle tests are new. The ARSNN oracle below is an
independent, loop-based numpy transcription of the *published update
equations* (gated LIF + spike-segmented readout), used to validate the dense
lax.scan formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eas_snn_tpu.ops import (
    arsnn_scan,
    atan_spike,
    get_spike_fn,
    lif_scan,
    lif_step,
    plif_scan,
    rectangle,
    sigmoid_spike,
)


class TestSurrogates:
    def test_rectangle_forward(self):
        x = jnp.array([-1.0, -0.2, 0.0, 0.2, 1.0])
        np.testing.assert_array_equal(rectangle(x), [0, 0, 0, 1, 1])

    def test_rectangle_grad(self):
        # d/dx = alpha * [|x| < 0.5/alpha]
        g = jax.grad(lambda x: rectangle(x, 1.0).sum())(
            jnp.array([-1.0, -0.4, 0.0, 0.4, 1.0])
        )
        np.testing.assert_allclose(g, [0, 1, 1, 1, 0])
        g2 = jax.grad(lambda x: rectangle(x, 2.0).sum())(
            jnp.array([-0.3, -0.2, 0.2, 0.3])
        )
        np.testing.assert_allclose(g2, [0, 2, 2, 0])

    def test_atan_forward_and_grad(self):
        x = jnp.array([-0.5, 0.0, 0.5])
        np.testing.assert_array_equal(atan_spike(x), [0, 1, 1])
        g = jax.grad(lambda x: atan_spike(x, 2.0).sum())(x)
        expect = (2.0 / 2) / (1 + (np.pi / 2 * 2.0 * np.array([-0.5, 0, 0.5])) ** 2)
        np.testing.assert_allclose(g, expect, rtol=1e-6)

    def test_sigmoid_grad_peak(self):
        g = jax.grad(lambda x: sigmoid_spike(x, 4.0).sum())(jnp.array([0.0]))
        np.testing.assert_allclose(g, [4.0 * 0.25], rtol=1e-6)

    def test_registry(self):
        for name in ["rect", "atan", "sigmoid", "tanh", "patan"]:
            fn = get_spike_fn(name, 2.0)
            out = fn(jnp.array([1.0, -1.0]))
            np.testing.assert_array_equal(out, [1, 0])

    def test_patan_matches_atan_grad(self):
        x = jnp.linspace(-1, 1, 11)
        ga = jax.grad(lambda x: atan_spike(x, 1.5).sum())(x)
        gp = jax.grad(lambda x: get_spike_fn("patan", 1.5)(x).sum())(x)
        np.testing.assert_allclose(ga, gp, rtol=1e-5)


class TestLIF:
    def test_soft_reset_trace(self):
        # decay logit 0 -> effective decay 0.5; thresh 1, soft reset.
        fn = get_spike_fn("rect")
        v, vn, s = lif_step(jnp.array(0.0), jnp.array(0.8), jnp.array(0.0), 1.0, None, fn)
        assert v == vn == 0.8 and s == 0
        v, vn, s = lif_step(v, jnp.array(0.8), jnp.array(0.0), 1.0, None, fn)
        # v = 0.5*0.8 + 0.8 = 1.2 > 1 -> spike, soft reset to 0.2
        np.testing.assert_allclose(vn, 1.2)
        assert s == 1
        np.testing.assert_allclose(v, 0.2, atol=1e-7)

    def test_hard_reset(self):
        fn = get_spike_fn("rect")
        v, vn, s = lif_step(jnp.array(1.0), jnp.array(1.0), jnp.array(0.0), 1.0, 0.0, fn)
        # v = 1.5 -> spike -> hard reset to 0
        assert s == 1 and v == 0.0 and vn == 1.5

    def test_lif_scan_shapes_and_sum(self):
        psp = jnp.ones((4, 2, 3))
        spikes, v_final, v_sum = lif_scan(psp, jnp.array(0.0), 1.0, None, get_spike_fn("rect"))
        assert spikes.shape == (4, 2, 3)
        # step1 v=1 (no spike: v-thresh=0, rect is >0 strict), step2 v=1.5 spike...
        np.testing.assert_allclose(spikes[0], 0)
        np.testing.assert_allclose(spikes[1], 1)

    def test_plif_decay_half(self):
        # w=0 -> sigmoid=0.5 -> v <- 0.5 v + x; thresh 1 soft reset
        x = jnp.ones((3, 2)) * 0.9
        spikes, v = plif_scan(x, jnp.array(0.0), get_spike_fn("atan"))
        # t0: v=0.9 no spike; t1: v=1.35 spike -> 0.35; t2: v=1.075 spike
        np.testing.assert_array_equal(spikes[0], 0)
        np.testing.assert_array_equal(spikes[1], 1)
        np.testing.assert_array_equal(spikes[2], 1)


def arsnn_oracle(events, w_in, w_gate, Ts, thresh, vreset, readout, write_zero):
    """Loop/scatter numpy oracle of the adaptive sampler (1x1 'convs')."""
    Tm, N = events.shape[:2]
    C = w_in.shape[1] // 2
    shape = events.shape[1:-1] + (C,)
    vmem = np.zeros(shape)
    spike_last = np.zeros(shape)
    seg = np.zeros(shape, np.int64)
    vavg = np.zeros(shape)
    t_last = np.zeros(shape, np.int64) - 1
    agg = np.zeros((Ts,) + shape)
    for t in range(Tm):
        state = spike_last @ w_gate
        g_rec, c_rec = np.split(state, 2, -1)
        inp = events[t] @ w_in
        g_in, c_in = np.split(inp, 2, -1)
        gate = 1 / (1 + np.exp(-(g_in + g_rec)))
        v = gate * vmem + (c_in + c_rec)
        spike = (v > thresh).astype(float)
        vn = v
        vmem = v - thresh * spike if vreset is None else v * (1 - spike) + vreset * spike
        vavg = vavg + vn
        spiked = spike > 0.5
        valid = spiked & (seg < Ts)
        if readout == "sum":
            val = vavg
        elif readout == "last":
            val = vmem
        else:
            val = vavg / np.maximum(t - t_last, 1)
        idx = np.nonzero(valid)
        agg[(seg[idx],) + idx] += val[idx]
        seg[idx] += 1
        t_last[idx] = t
        vavg[spiked] = 0
        spike_last = spike
    no_spike = spike_last <= 0.5
    valid = no_spike & (seg < Ts)
    if readout == "sum":
        val = vavg
    elif readout == "last":
        val = vmem
    else:
        val = vavg / np.maximum(Tm - 1 - t_last, 1)
    if write_zero:
        val = val * 0
    idx = np.nonzero(valid)
    agg[(seg[idx],) + idx] += val[idx]
    return agg


class TestARSNN:
    @pytest.mark.parametrize("readout", ["sum", "last", "avg"])
    @pytest.mark.parametrize("write_zero", [False, True])
    @pytest.mark.parametrize("vreset", [None, 0.0])
    def test_matches_oracle(self, rng, readout, write_zero, vreset):
        # float64 on both sides: the recurrent spike dynamics flip on
        # threshold edges under precision mismatch, which is expected.
        Tm, N, H, W, Cin, C, Ts = 6, 2, 3, 3, 2, 2, 3
        events = rng.normal(size=(Tm, N, H, W, Cin))
        w_in = rng.normal(size=(Cin, 2 * C)) * 0.7
        w_gate = rng.normal(size=(C, 2 * C)) * 0.7

        with jax.enable_x64(True):
            agg = arsnn_scan(
                jnp.asarray(events),
                lambda x: x @ jnp.asarray(w_in),
                lambda x: x @ jnp.asarray(w_gate),
                Ts=Ts,
                thresh=1.0,
                vreset=vreset,
                spike_fn=get_spike_fn("rect"),
                readout=readout,
                write_zero=write_zero,
            )
        expect = arsnn_oracle(events, w_in, w_gate, Ts, 1.0, vreset, readout, write_zero)
        np.testing.assert_allclose(np.asarray(agg), expect, rtol=1e-8, atol=1e-9)

    @pytest.mark.parametrize("readout", ["sum", "last", "avg"])
    def test_agg_ys_mode_matches_carry(self, rng, readout):
        """agg_mode='ys' (post-scan aggregation assembly) must equal the
        default in-carry accumulation exactly — values AND gradients (the
        sum over steps is merely reordered; masks carry no gradient)."""
        Tm, N, H, W, Cin, C, Ts = 6, 2, 4, 5, 2, 2, 3
        events = rng.normal(size=(Tm, N, H, W, Cin)).astype(np.float32)
        w_in = jnp.asarray(rng.normal(size=(Cin, 2 * C)).astype(np.float32))
        w_gate = jnp.asarray(rng.normal(size=(C, 2 * C)).astype(np.float32))

        def run(wi, wg, mode, sa=False, wz=False):
            return arsnn_scan(
                jnp.asarray(events), lambda x: x @ wi, lambda x: x @ wg,
                Ts=Ts, thresh=0.8, vreset=None,
                spike_fn=get_spike_fn("atan"), readout=readout,
                spike_attach=sa, write_zero=wz, agg_mode=mode,
            )

        for sa in (False, True):
            for wz in (False, True):
                a = run(w_in, w_gate, "carry", sa, wz)
                b = run(w_in, w_gate, "ys", sa, wz)
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
                ga = jax.grad(
                    lambda wi, wg: (run(wi, wg, "carry", sa, wz) ** 2).sum(),
                    argnums=(0, 1),
                )(w_in, w_gate)
                gb = jax.grad(
                    lambda wi, wg: (run(wi, wg, "ys", sa, wz) ** 2).sum(),
                    argnums=(0, 1),
                )(w_in, w_gate)
                for x, y in zip(ga, gb):
                    np.testing.assert_allclose(
                        np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-6
                    )
        # record mode parity
        a, ra = run(w_in, w_gate, "carry")[0], None
        (a2, ra2) = arsnn_scan(
            jnp.asarray(events), lambda x: x @ w_in, lambda x: x @ w_gate,
            Ts=Ts, thresh=0.8, vreset=None, spike_fn=get_spike_fn("atan"),
            readout=readout, record=True, agg_mode="ys",
        )
        (a3, ra3) = arsnn_scan(
            jnp.asarray(events), lambda x: x @ w_in, lambda x: x @ w_gate,
            Ts=Ts, thresh=0.8, vreset=None, spike_fn=get_spike_fn("atan"),
            readout=readout, record=True, agg_mode="carry",
        )
        np.testing.assert_array_equal(np.asarray(a2), np.asarray(a3))
        np.testing.assert_array_equal(np.asarray(ra2), np.asarray(ra3))

    def test_spike_attach_forward_identity(self, rng):
        # forward spikes are exactly 1 at write positions -> values unchanged
        Tm, N, H, W, C, Ts = 5, 1, 2, 2, 2, 2
        events = rng.normal(size=(Tm, N, H, W, C)).astype(np.float32)
        w_in = rng.normal(size=(C, 2 * C)).astype(np.float32)
        w_gate = rng.normal(size=(C, 2 * C)).astype(np.float32)
        kw = dict(
            Ts=Ts, thresh=1.0, vreset=0.0, spike_fn=get_spike_fn("rect"),
            readout="sum",
        )
        f = lambda sa: arsnn_scan(
            jnp.asarray(events),
            lambda x: x @ jnp.asarray(w_in),
            lambda x: x @ jnp.asarray(w_gate),
            spike_attach=sa,
            **kw,
        )
        np.testing.assert_allclose(np.asarray(f(True)), np.asarray(f(False)), rtol=1e-6)

    def test_gradients_flow_and_are_finite(self, rng):
        Tm, N, H, W, C, Ts = 4, 1, 2, 2, 2, 2
        events = jnp.asarray(rng.normal(size=(Tm, N, H, W, C)).astype(np.float32))
        w_in = jnp.asarray(rng.normal(size=(C, 2 * C)).astype(np.float32))
        w_gate = jnp.asarray(rng.normal(size=(C, 2 * C)).astype(np.float32))

        def loss(w_in, w_gate, events):
            agg = arsnn_scan(
                events,
                lambda x: x @ w_in,
                lambda x: x @ w_gate,
                Ts=Ts, thresh=1.0, vreset=0.0,
                spike_fn=get_spike_fn("atan"),
                readout="sum", spike_attach=True,
            )
            return (agg ** 2).sum()

        g_in, g_gate, g_ev = jax.grad(loss, argnums=(0, 1, 2))(w_in, w_gate, events)
        for g in (g_in, g_gate, g_ev):
            assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g_gate).sum()) > 0  # recurrence receives gradient
        assert float(jnp.abs(g_in).sum()) > 0

    def test_write_zero_cuts_residual_grad(self, rng):
        # With write_zero, elements that never spike contribute no gradient.
        Tm, N, H, W, C, Ts = 3, 1, 1, 1, 1, 2
        events = jnp.full((Tm, N, H, W, C), -5.0)  # never spikes
        w_in = jnp.eye(1, 2) * 0.1
        w_gate = jnp.zeros((1, 2))

        def loss(w, wz):
            agg = arsnn_scan(
                events, lambda x: x @ w, lambda x: x @ w_gate,
                Ts=Ts, thresh=1.0, vreset=0.0,
                spike_fn=get_spike_fn("rect"), readout="sum", write_zero=wz,
            )
            return agg.sum()

        g_no = jax.grad(lambda w: loss(w, False))(w_in)
        g_wz = jax.grad(lambda w: loss(w, True))(w_in)
        assert float(jnp.abs(g_no).sum()) > 0
        np.testing.assert_allclose(np.asarray(g_wz), 0.0)

    def test_record_spike_times(self, rng):
        Tm, N, H, W, C, Ts = 4, 1, 2, 2, 2, 2
        events = jnp.asarray(rng.normal(size=(Tm, N, H, W, C)).astype(np.float32)) * 3
        agg, t_rec = arsnn_scan(
            events, lambda x: jnp.concatenate([x, x], -1),
            lambda x: jnp.concatenate([x, x], -1) * 0.1,
            Ts=Ts, thresh=1.0, vreset=0.0,
            spike_fn=get_spike_fn("rect"), readout="sum", record=True,
        )
        assert t_rec.shape == (Tm, N, H, W, C)
        assert t_rec.dtype == jnp.int32
