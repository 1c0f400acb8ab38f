"""Fused eval-time 1x1-conv + folded-BN + PLIF kernel (ops/conv_plif_pallas).

Equality strategy: weights/bias are quarter-valued (exact in bf16/f32) and
inputs are 0/1 spikes, so every product and f32 sum is exact regardless of
summation order — the kernel (interpret mode) must match the pure-JAX
reference BITWISE. The fused site vs the unfused conv->BN->PLIF chain is
compared statistically (the BN fold and the skipped bf16 preact round are
a real arithmetic difference that chaotic threshold dynamics amplify on a
small fraction of elements — same story as BENCHMARKS.md's bf16 notes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from eas_snn_tpu.ops.conv_plif_pallas import (
    conv1x1_plif_fused,
    conv1x1_plif_reference,
    conv1x1_plif_supported,
)

T, B = 3, 128
TB = T * B


def _spikes(seed, shape, dtype):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2, shape), dtype)


def _quarters(seed, shape):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(-6, 7, shape) * 0.25, jnp.float32)


class TestKernelVsReference:
    @pytest.mark.parametrize("in_dt", [jnp.int8, jnp.bfloat16])
    @pytest.mark.parametrize("hwc", [(4, 4, 16, 48), (2, 5, 32, 64)])
    def test_bitwise(self, in_dt, hwc):
        H, W, Cin, Cout = hwc
        x = _spikes(1, (TB, H, W, Cin), in_dt)
        w_oc = _quarters(2, (Cout, Cin))
        bias = _quarters(3, (Cout,))
        wp = jnp.asarray(-1.1, jnp.float32)
        assert conv1x1_plif_supported(x.shape, T, Cout, x.dtype)
        y = conv1x1_plif_fused(
            x, w_oc, bias, T, wp, interpret=True, out_dtype=jnp.int8
        )
        ref = conv1x1_plif_reference(
            x, w_oc, bias, T, wp, out_dtype=jnp.int8
        )
        assert y.shape == (TB, H, W, Cout) and y.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
        assert 0.05 < np.asarray(ref, np.float32).mean() < 0.95

    def test_float_out(self):
        x = _spikes(4, (TB, 4, 4, 16), jnp.bfloat16)
        w_oc = _quarters(5, (24, 16))
        bias = _quarters(6, (24,))
        wp = jnp.asarray(-1.0, jnp.float32)
        y = conv1x1_plif_fused(
            x, w_oc, bias, T, wp, interpret=True, out_dtype=jnp.bfloat16
        )
        ref = conv1x1_plif_reference(
            x, w_oc, bias, T, wp, out_dtype=jnp.bfloat16
        )
        assert y.dtype == jnp.bfloat16
        np.testing.assert_array_equal(
            np.asarray(y, np.float32), np.asarray(ref, np.float32)
        )


class TestMultiInputVirtualConcat:
    """Tuple input = unmaterialized channel concat: one MXU dot per piece."""

    def test_bitwise_vs_reference_and_concat(self):
        H, W = 4, 4
        cs = (16, 8, 8)
        Cout = 24
        xs = tuple(
            _spikes(30 + j, (TB, H, W, c), jnp.int8) for j, c in enumerate(cs)
        )
        w_oc = _quarters(33, (Cout, sum(cs)))
        bias = _quarters(34, (Cout,))
        wp = jnp.asarray(-1.1, jnp.float32)
        shapes = tuple(x.shape for x in xs)
        dts = tuple(x.dtype for x in xs)
        assert conv1x1_plif_supported(shapes, T, Cout, dts)
        y = conv1x1_plif_fused(
            xs, w_oc, bias, T, wp, interpret=True, out_dtype=jnp.int8
        )
        ref = conv1x1_plif_reference(xs, w_oc, bias, T, wp,
                                     out_dtype=jnp.int8)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
        # quarter weights + 0/1 inputs: exact arithmetic, so the virtual
        # concat must equal the materialized one bitwise
        xcat = jnp.concatenate(xs, axis=-1)
        ycat = conv1x1_plif_fused(
            xcat, w_oc, bias, T, wp, interpret=True, out_dtype=jnp.int8
        )
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ycat))

    def test_csplayer_tuple_input_matches_concat(self):
        """CSPLayer/BaseConv accept tuple inputs on the plain (unfused)
        path with identical semantics to a pre-concatenated input."""
        from eas_snn_tpu.models.blocks import CSPLayer, NeuronCfg

        layer = CSPLayer(
            16, n=1, neuron=NeuronCfg.snn(T), dtype=jnp.float32
        )
        a = _spikes(40, (TB, 4, 4, 8), jnp.float32)
        b = _spikes(41, (TB, 4, 4, 8), jnp.float32)
        v = layer.init(jax.random.PRNGKey(0), (a, b), True)
        y_t = layer.apply(v, (a, b), False)
        y_c = layer.apply(v, jnp.concatenate([a, b], -1), False)
        np.testing.assert_array_equal(
            np.asarray(y_t, np.float32), np.asarray(y_c, np.float32)
        )


class TestKernel3x3VsReference:
    @pytest.mark.parametrize("in_dt", [jnp.int8, jnp.bfloat16])
    @pytest.mark.parametrize(
        # H=16 -> h_blk=8, 2 grid blocks: exercises the cross-block halo
        # rows (slim prev/next inputs), not just the zeroed image border
        "hwc", [(8, 5, 16, 48), (4, 4, 32, 24), (16, 4, 8, 16)]
    )
    def test_bitwise(self, in_dt, hwc):
        from eas_snn_tpu.ops.conv_plif_pallas import (
            conv3x3_plif_fused,
            conv3x3_plif_reference,
            conv3x3_plif_supported,
            fold_conv3x3,
        )

        H, W, Cin, Cout = hwc
        x = _spikes(11, (TB, H, W, Cin), in_dt)
        k = _quarters(12, (3, 3, Cin, Cout))
        mul = _quarters(13, (Cout,)) + 2.0
        w3 = fold_conv3x3(k, mul)
        bias = _quarters(14, (Cout,))
        wp = jnp.asarray(-1.1, jnp.float32)
        assert conv3x3_plif_supported(x.shape, T, Cout, x.dtype)
        y = conv3x3_plif_fused(
            x, w3, bias, T, wp, interpret=True, out_dtype=jnp.int8
        )
        ref = conv3x3_plif_reference(
            x, w3, bias, T, wp, out_dtype=jnp.int8
        )
        assert y.shape == (TB, H, W, Cout) and y.dtype == jnp.int8
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
        assert 0.05 < np.asarray(ref, np.float32).mean() < 0.95

    def test_reference_matches_unfolded_conv(self):
        """fold_conv3x3 + reference == plain conv(+bias)+recurrence on the
        original HWIO kernel (validates the (dy, co, dx*ci) weight
        packing against lax.conv itself)."""
        from eas_snn_tpu.ops.conv_plif_pallas import (
            conv3x3_plif_reference,
            fold_conv3x3,
        )

        H, W, Cin, Cout = 4, 5, 8, 16
        x = _spikes(15, (TB, H, W, Cin), jnp.int8)
        k = _quarters(16, (3, 3, Cin, Cout))
        mul = jnp.ones((Cout,), jnp.float32)
        bias = _quarters(17, (Cout,))
        wp = jnp.asarray(-1.0, jnp.float32)
        y = conv3x3_plif_reference(
            x, fold_conv3x3(k, mul), bias, T, wp, out_dtype=jnp.int8
        )
        acc = jax.lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + bias
        a = 1.0 - jax.nn.sigmoid(wp)
        xs = acc.reshape((T, B) + acc.shape[1:])
        v = jnp.zeros_like(xs[0])
        outs = []
        for t in range(T):
            v = v * a + xs[t]
            sp = v - 1.0 >= 0
            outs.append(sp.astype(jnp.int8))
            v = v - sp.astype(jnp.float32)
        ref = jnp.stack(outs).reshape((TB,) + acc.shape[1:])
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_baseconv_3x3_wiring(monkeypatch):
    """BaseConv routes eligible 3x3 sites through the fused kernel with the
    correctly folded weights."""
    import eas_snn_tpu.ops.conv_plif_pallas as cpp
    from eas_snn_tpu.models.blocks import BaseConv, NeuronCfg

    Cin, Cout = 16, 24
    conv = BaseConv(
        Cout, 3, 1, act="silu", neuron=NeuronCfg.snn(T), dtype=jnp.bfloat16
    )
    x = _spikes(18, (TB, 4, 4, Cin), jnp.int8)
    v = conv.init(jax.random.PRNGKey(0), x.astype(jnp.bfloat16), True)
    v = jax.tree_util.tree_map(
        lambda l: l + 0.25 if l.ndim == 1 and l.shape[0] == Cout else l, v
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "1")
    real = cpp.conv3x3_plif_fused
    monkeypatch.setattr(
        cpp, "conv3x3_plif_fused",
        lambda *a, **k: real(*a, **{**k, "interpret": True}),
    )
    y = conv.apply(v, x, False)
    assert y.dtype == jnp.int8

    scale = v["params"]["bn"]["scale"]
    beta = v["params"]["bn"]["bias"]
    mean = v["batch_stats"]["bn"]["mean"]
    var = v["batch_stats"]["bn"]["var"]
    mul = jax.lax.rsqrt(var + 1e-3) * scale
    w3 = cpp.fold_conv3x3(v["params"]["conv"]["kernel"], mul)
    ref = cpp.conv3x3_plif_reference(
        x, w3, beta - mean * mul, T, v["params"]["PLIF_0"]["w"],
        out_dtype=jnp.int8,
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


class TestKernel3x3Stride2VsReference:
    @pytest.mark.parametrize("in_dt", [jnp.int8, jnp.bfloat16])
    @pytest.mark.parametrize(
        # Ho=8 -> ho_blk=4, 2 grid blocks: exercises the cross-block slim
        # halo row, not just the zeroed top border. Ho=6 -> ho_blk=2,
        # 3 grid blocks: the VMEM-fitted block size the flagship
        # downsample geometries use (hb=4 overflows the 80 MB gate there)
        "hwc", [(8, 6, 16, 48), (16, 8, 8, 16), (12, 8, 16, 24)]
    )
    def test_bitwise(self, in_dt, hwc):
        from eas_snn_tpu.ops.conv_plif_pallas import (
            conv3x3s2_plif_fused,
            conv3x3s2_plif_reference,
            conv3x3s2_plif_supported,
            fold_conv3x3,
        )

        H, W, Cin, Cout = hwc
        x = _spikes(50, (TB, H, W, Cin), in_dt)
        k = _quarters(51, (3, 3, Cin, Cout))
        mul = _quarters(52, (Cout,)) + 2.0
        w3 = fold_conv3x3(k, mul)
        bias = _quarters(53, (Cout,))
        wp = jnp.asarray(-1.1, jnp.float32)
        assert conv3x3s2_plif_supported(x.shape, T, Cout, x.dtype)
        y = conv3x3s2_plif_fused(
            x, w3, bias, T, wp, interpret=True, out_dtype=jnp.int8
        )
        ref = conv3x3s2_plif_reference(
            x, w3, bias, T, wp, out_dtype=jnp.int8
        )
        assert y.shape == (TB, H // 2, W // 2, Cout)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
        assert 0.05 < np.asarray(ref, np.float32).mean() < 0.95

    def test_baseconv_s2_wiring(self, monkeypatch):
        import eas_snn_tpu.ops.conv_plif_pallas as cpp
        from eas_snn_tpu.models.blocks import BaseConv, NeuronCfg

        Cin, Cout = 16, 24
        conv = BaseConv(
            Cout, 3, 2, act="silu", neuron=NeuronCfg.snn(T),
            dtype=jnp.bfloat16,
        )
        x = _spikes(54, (TB, 8, 8, Cin), jnp.int8)
        v = conv.init(jax.random.PRNGKey(0), x.astype(jnp.bfloat16), True)
        v = jax.tree_util.tree_map(
            lambda l: l + 0.25 if l.ndim == 1 and l.shape[0] == Cout else l,
            v,
        )
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "1")
        real = cpp.conv3x3s2_plif_fused
        monkeypatch.setattr(
            cpp, "conv3x3s2_plif_fused",
            lambda *a, **k: real(*a, **{**k, "interpret": True}),
        )
        y = conv.apply(v, x, False)
        assert y.dtype == jnp.int8 and y.shape == (TB, 4, 4, Cout)

        scale = v["params"]["bn"]["scale"]
        beta = v["params"]["bn"]["bias"]
        mean = v["batch_stats"]["bn"]["mean"]
        var = v["batch_stats"]["bn"]["var"]
        mul = jax.lax.rsqrt(var + 1e-3) * scale
        w3 = cpp.fold_conv3x3(v["params"]["conv"]["kernel"], mul)
        ref = cpp.conv3x3s2_plif_reference(
            x, w3, beta - mean * mul, T, v["params"]["PLIF_0"]["w"],
            out_dtype=jnp.int8,
        )
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_flagship_composition_engages_fusion(monkeypatch):
    """In the real EASYOLOX eval forward (spiking backbone), the whole-site
    fusion engages at both 1x1 and 3x3 stride-1 spiking sites, and the
    output stays a valid detection tensor. Kernels are monkeypatched to
    their (XLA) reference impls so this runs on CPU; engagement counts are
    recorded by the wrappers."""
    import eas_snn_tpu.ops.conv_plif_pallas as cpp
    from __graft_entry__ import _build_model

    model = _build_model(
        depth=0.33, width=0.25, T=T, Ts=3, Tm=4, compute_dtype="bfloat16"
    )
    rng = np.random.default_rng(0)
    events = jnp.asarray(
        rng.poisson(0.2, (B, 1, 4, 64, 64, 2)), jnp.float32
    )
    v = model.init(jax.random.PRNGKey(0), events[:1], train=False)

    calls = {"1x1": 0, "3x3": 0, "3x3s2": 0}

    def wrap(key, ref):
        def f(*a, **k):
            calls[key] += 1
            return ref(*a[:5], **{
                kk: vv for kk, vv in k.items() if kk != "interpret"})
        return f

    import eas_snn_tpu.ops.plif_pallas as pp

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "1")
    monkeypatch.setattr(cpp, "conv1x1_plif_fused",
                        wrap("1x1", cpp.conv1x1_plif_reference))
    monkeypatch.setattr(cpp, "conv3x3_plif_fused",
                        wrap("3x3", cpp.conv3x3_plif_reference))
    monkeypatch.setattr(cpp, "conv3x3s2_plif_fused",
                        wrap("3x3s2", cpp.conv3x3s2_plif_reference))
    # any remaining plain-PLIF site would otherwise hit the real Pallas
    # kernel, which cannot run on CPU
    monkeypatch.setattr(pp, "plif_fused_supported", lambda *a: False)
    out = model.apply(v, events, train=False)
    assert calls["1x1"] >= 8, calls   # CSP conv1/2/3 + bottleneck/SPP/FPN
    assert calls["3x3"] >= 3, calls   # bottleneck conv2 sites
    assert calls["3x3s2"] >= 3, calls  # stage downsample convs
    arr = np.asarray(out, np.float32)
    assert np.isfinite(arr).all() and arr.shape[0] == B


def test_supported_gate():
    assert not conv1x1_plif_supported((TB, 4, 4, 12), T, 16, jnp.int8)  # C%8
    assert not conv1x1_plif_supported((96, 4, 4, 16), T, 16, jnp.int8)  # B%128
    assert not conv1x1_plif_supported((TB, 4, 4, 16), T, 16, jnp.int32)
    assert conv1x1_plif_supported((TB, 4, 4, 16), T, 16, jnp.float32)


class TestBaseConvWiring:
    """The BaseConv eval fused branch folds BN correctly and routes through
    the kernel; vs the unfused chain only a threshold-edge fraction of
    spikes may differ."""

    def _mk(self, Cin=16, Cout=48):
        from eas_snn_tpu.models.blocks import BaseConv, NeuronCfg

        conv = BaseConv(
            Cout, 1, 1, act="silu", neuron=NeuronCfg.snn(T),
            dtype=jnp.bfloat16,
        )
        x = _spikes(7, (TB, 4, 4, Cin), jnp.int8)
        v = conv.init(jax.random.PRNGKey(0), x.astype(jnp.bfloat16), True)
        # nudge BN stats/params off init so the fold is non-trivial
        v = jax.tree_util.tree_map(
            lambda l: l + 0.25 if l.ndim == 1 and l.shape[0] == Cout else l, v
        )
        return conv, v, x

    def test_fused_branch_matches_direct_op(self, monkeypatch):
        import eas_snn_tpu.ops.conv_plif_pallas as cpp

        conv, v, x = self._mk()
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "1")
        real = cpp.conv1x1_plif_fused
        monkeypatch.setattr(
            cpp, "conv1x1_plif_fused",
            lambda *a, **k: real(*a, **{**k, "interpret": True}),
        )
        y = conv.apply(v, x, False)
        assert y.dtype == jnp.int8

        # hand-fold and call the op directly
        wk = v["params"]["conv"]["kernel"][0, 0]
        scale = v["params"]["bn"]["scale"]
        beta = v["params"]["bn"]["bias"]
        mean = v["batch_stats"]["bn"]["mean"]
        var = v["batch_stats"]["bn"]["var"]
        mul = jax.lax.rsqrt(var + 1e-3) * scale
        w_oc = (wk.astype(jnp.float32) * mul[None, :]).T
        bias_eff = beta - mean * mul
        wp = v["params"]["PLIF_0"]["w"]
        ref = cpp.conv1x1_plif_reference(
            x, w_oc, bias_eff, T, wp, out_dtype=jnp.int8
        )
        np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))

    def test_fused_vs_unfused_statistical(self, monkeypatch):
        import eas_snn_tpu.ops.conv_plif_pallas as cpp

        conv, v, x = self._mk()
        y_plain = conv.apply(v, x.astype(jnp.bfloat16), False)

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

        monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "1")
        real = cpp.conv1x1_plif_fused
        monkeypatch.setattr(
            cpp, "conv1x1_plif_fused",
            lambda *a, **k: real(*a, **{**k, "interpret": True}),
        )
        y_fused = conv.apply(v, x, False)
        a = np.asarray(y_plain, np.float32)
        b = np.asarray(y_fused, np.float32)
        assert set(np.unique(b)) <= {0.0, 1.0}
        # arithmetic differs (BN fold + no bf16 preact round): only a small
        # threshold-edge fraction may flip
        assert (a != b).mean() < 0.02
        assert abs(a.mean() - b.mean()) < 0.01

    def test_init_and_train_unaffected(self):
        conv, v, x = self._mk()
        # init created the full unfused tree
        assert set(v["params"].keys()) == {"conv", "bn", "PLIF_0"}
        y, _ = conv.apply(
            v, x.astype(jnp.bfloat16), True, mutable=["batch_stats"]
        )
        assert y.shape == (TB, 4, 4, 48)


class TestEngagementPolicy:
    """The measured per-geometry policy (ops/conv_plif_policy.py)."""

    def test_auto_matches_measured_table(self, monkeypatch):
        from eas_snn_tpu.ops.conv_plif_policy import should_fuse

        monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "auto")
        TB128 = 3 * 128
        # decisive winners from tools/bench_conv_plif_sites.py
        assert should_fuse(1, 1, (TB128, 64, 80, 96), 48)
        assert should_fuse(
            1, 1, ((TB128, 64, 80, 48), (TB128, 64, 80, 48)), 96
        )
        assert should_fuse(3, 1, (TB128, 32, 40, 96), 96)
        assert should_fuse(1, 1, (TB128, 16, 20, 384), 192)
        assert should_fuse(3, 2, (TB128, 128, 160, 48), 96)  # dark2.down
        # decisive losers / noise sites stay unfused
        assert not should_fuse(3, 2, (TB128, 64, 80, 96), 192)   # d3.down
        assert not should_fuse(3, 2, (TB128, 16, 20, 384), 768)  # d5.down
        assert not should_fuse(3, 1, (TB128, 128, 160, 8), 48)    # stem
        assert not should_fuse(1, 1, (TB128, 64, 80, 48), 48)     # m.conv1
        assert not should_fuse(3, 1, (TB128, 64, 80, 48), 48)     # m.conv2
        assert not should_fuse(1, 1, (TB128, 32, 40, 192), 96)    # d3 conv12
        assert not should_fuse(1, 1, (TB128, 8, 10, 768), 384)    # noise
        # unknown geometry defaults off
        assert not should_fuse(1, 1, (TB128, 100, 100, 512), 512)

    def test_env_overrides(self, monkeypatch):
        from eas_snn_tpu.ops.conv_plif_policy import should_fuse

        site = (3 * 128, 100, 100, 512)
        monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "1")
        assert should_fuse(1, 1, site, 512) and should_fuse(3, 1, site, 512)
        monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "0")
        assert not should_fuse(1, 1, (3 * 128, 64, 80, 96), 48)
        monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "1x1")
        assert should_fuse(1, 1, site, 512)
        assert not should_fuse(3, 1, site, 512)
        monkeypatch.setenv("EAS_CONV_PLIF_FUSE", "3x3")
        assert should_fuse(3, 2, site, 512)
        assert not should_fuse(1, 1, site, 512)
