"""Fused Pallas PLIF kernel vs the XLA scan reference (interpret mode).

Checks the three contracts the backbone relies on:
  * forward spikes bit-equal to ops/lif.py:plif_scan;
  * input gradient and decay-logit gradient match the scan's autodiff VJP
    (an explicit f64 oracle for bf16, where the CPU scan itself is sloppy);
  * the PLIF module routes through the kernel and stays equivalent.

The kernel requires B % 128 == 0 (T steps are 128-aligned lane slices of
the conv's batch-minor layout), so fixtures use B=128 with small H/W/C.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eas_snn_tpu.ops.lif import plif_scan
from eas_snn_tpu.ops.plif_pallas import plif_fused, plif_fused_supported
from eas_snn_tpu.ops.surrogate import get_spike_fn

T, B, H, W, C = 3, 128, 4, 4, 16


@pytest.fixture(autouse=True)
def exact_math(monkeypatch):
    """Pin the exact-parity tests to IEEE division: the backward kernels
    default to the VPU's approximate reciprocal for the atan surrogate
    (EAS_PLIF_FAST_MATH, ~2^-8 relative — the same magnitude as the bf16
    rounding the production model already applies everywhere); the
    bounded deviation has its own test below."""
    monkeypatch.setenv("EAS_PLIF_FAST_MATH", "0")


def _ref(x_tb, w, kind, alpha, thresh=1.0):
    """XLA scan path on the folded (T*B, H, W, C) input."""
    xs = x_tb.reshape((T, B) + x_tb.shape[1:])
    fn = get_spike_fn(kind, alpha)
    s, _ = plif_scan(xs, w.astype(x_tb.dtype), fn, thresh)
    return s.reshape(x_tb.shape)


def _x(seed, dtype):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(0.8, 0.8, (T * B, H, W, C)), dtype)


@pytest.mark.parametrize("kind", ["atan", "rect", "sigmoid", "tanh"])
def test_forward_bit_equal_f32(kind):
    x = _x(0, jnp.float32)
    w = jnp.float32(0.3)
    assert plif_fused_supported(x.shape, T, x.dtype)
    got = plif_fused(x, T, w, spike_fn=kind, alpha=2.0, interpret=True)
    want = _ref(x, w, kind, 2.0)
    assert got.dtype == want.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("kind", ["atan", "rect"])
def test_forward_bf16_matches_f32_membrane(kind):
    """bf16 storage: the kernel's membrane runs in f32, so the oracle is
    the f32 scan over upcast inputs (NOT the bf16-rounded XLA scan, which
    the kernel intentionally improves on — see module docstring)."""
    x = _x(0, jnp.float32).astype(jnp.bfloat16)
    w = jnp.float32(0.3)
    got = plif_fused(x, T, w, spike_fn=kind, alpha=2.0, interpret=True)
    want = _ref(x.astype(jnp.float32), w, kind, 2.0).astype(jnp.bfloat16)
    assert got.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("kind", ["atan", "rect"])
def test_gradients_match_scan_vjp(kind):
    x = _x(1, jnp.float32)
    w = jnp.float32(-0.2)
    g = jnp.asarray(
        np.random.default_rng(9).normal(size=x.shape), jnp.float32
    )

    def loss_ref(x, w):
        return (_ref(x, w, kind, 2.0) * g).sum()

    def loss_fused(x, w):
        return (
            plif_fused(x, T, w, spike_fn=kind, alpha=2.0, interpret=True) * g
        ).sum()

    dx_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    dx_f, dw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(
        np.asarray(dx_f), np.asarray(dx_r), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(dw_f), float(dw_r), rtol=1e-4)


def test_gradients_bf16_input(kind="atan"):
    """bf16 grads vs the f32-membrane scan VJP on upcast inputs — the
    kernel's arithmetic is defined as f32-over-bf16-storage, so the f32
    scan (whose VJP accumulates the decay grad in f32, unlike the bf16
    CPU scan, which saturates at ~|128|) is the exact oracle."""
    x = _x(2, jnp.float32).astype(jnp.bfloat16)
    w = jnp.float32(0.1)
    g = jnp.ones(x.shape, jnp.bfloat16)

    def loss_fused(x, w):
        return (
            plif_fused(x, T, w, spike_fn=kind, alpha=2.0, interpret=True) * g
        ).astype(jnp.float32).sum()

    def loss_ref(x, w):
        s = _ref(x.astype(jnp.float32), w, kind, 2.0)
        return (s * g.astype(jnp.float32)).sum()

    dx_f, dw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    assert dx_f.dtype == x.dtype and dx_r.dtype == x.dtype
    np.testing.assert_allclose(float(dw_f), float(dw_r), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(dx_f, np.float32), np.asarray(dx_r, np.float32),
        rtol=1e-2, atol=1e-2,
    )


def test_supported_gate():
    # batch not a multiple of 128 -> unsupported
    assert not plif_fused_supported((3 * 64, 4, 4, 16), 3, jnp.float32)
    # channels not a multiple of 8 -> layout view not a bitcast
    assert not plif_fused_supported((3 * 128, 4, 4, 12), 3, jnp.float32)
    # int dtype -> unsupported
    assert not plif_fused_supported((3 * 128, 4, 4, 16), 3, jnp.int32)
    assert plif_fused_supported((3 * 128, 16, 20, 48), 3, jnp.bfloat16)


def test_plif_module_fused_path_equivalence():
    from eas_snn_tpu.models.blocks import PLIF

    x = _x(3, jnp.float32)
    m_ref = PLIF(T=T, fuse="never")
    m_fused = PLIF(T=T, fuse="interpret")
    v = m_ref.init(jax.random.PRNGKey(0), x)
    y_ref = m_ref.apply(v, x)
    y_fused = m_fused.apply(v, x)
    np.testing.assert_array_equal(np.asarray(y_fused), np.asarray(y_ref))


def test_int8_eval_storage_bit_lossless():
    """out_int8 stores the same 0/1 spike set as the float path (eval-only
    storage optimization for the HBM-bound backbone)."""
    for dtype in (jnp.float32, jnp.bfloat16):
        x = _x(7, dtype)
        w = jnp.asarray(-1.1, jnp.float32)
        y_f = plif_fused(x, T, w, spike_fn="atan", interpret=True)
        y_i = plif_fused(
            x, T, w, spike_fn="atan", interpret=True, out_int8=True
        )
        assert y_i.dtype == jnp.int8
        np.testing.assert_array_equal(
            np.asarray(y_i, np.float32), np.asarray(y_f, np.float32)
        )


def test_plif_module_int8_gates_on_train():
    """PLIF(eval_store='int8') emits int8 at eval, float in training."""
    from eas_snn_tpu.models.blocks import PLIF

    x = _x(9, jnp.float32)
    m = PLIF(T=T, fuse="interpret")
    v = m.init(jax.random.PRNGKey(0), x)
    y_eval = m.apply(v, x)
    y_train = m.apply(v, x, train=True)
    assert y_eval.dtype == jnp.int8
    assert y_train.dtype == x.dtype
    np.testing.assert_array_equal(
        np.asarray(y_eval, np.float32), np.asarray(y_train, np.float32)
    )


def test_int8_view_train_storage_value_and_grad():
    """'view' mode (int8 store, float convert view) is bit-identical in
    value AND gradient to the plain float path — the train-side spike
    traffic halving."""
    x = _x(11, jnp.float32)
    w = jnp.asarray(-1.1, jnp.float32)
    g = jnp.asarray(
        np.random.default_rng(3).normal(size=x.shape), jnp.float32
    )

    def loss(mode):
        def f(xx, ww):
            s = plif_fused(
                xx, T, ww, spike_fn="atan", interpret=True, out_int8=mode
            )
            return (s * g).sum()
        return f

    y_f = plif_fused(x, T, w, spike_fn="atan", interpret=True)
    y_v = plif_fused(x, T, w, spike_fn="atan", interpret=True,
                     out_int8="view")
    assert y_v.dtype == x.dtype
    np.testing.assert_array_equal(np.asarray(y_v), np.asarray(y_f))
    (dx_f, dw_f) = jax.grad(loss(False), argnums=(0, 1))(x, w)
    (dx_v, dw_v) = jax.grad(loss("view"), argnums=(0, 1))(x, w)
    np.testing.assert_array_equal(np.asarray(dx_v), np.asarray(dx_f))
    np.testing.assert_array_equal(np.asarray(dw_v), np.asarray(dw_f))


class TestBNAffineFusion:
    """Train-mode BatchNorm fused into the PLIF kernel (affine path)."""

    def _affine(self, seed, C):
        rng = np.random.default_rng(seed)
        mean = jnp.asarray(rng.normal(0.1, 0.3, C), jnp.float32)
        mul = jnp.asarray(rng.normal(1.0, 0.2, C), jnp.float32)
        bias = jnp.asarray(rng.normal(0.0, 0.2, C), jnp.float32)
        return mean, mul, bias

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_values_match_unfused(self, dtype):
        x = _x(21, dtype)
        w = jnp.asarray(-1.1, jnp.float32)
        mean, mul, bias = self._affine(5, C)
        y_fused = plif_fused(
            x, T, w, spike_fn="atan", interpret=True,
            affine=(mean, mul, bias),
        )
        # unfused: flax-order normalize, storage-dtype round, plain kernel
        xn = (((x - mean) * mul) + bias).astype(dtype)
        y_ref = plif_fused(xn, T, w, spike_fn="atan", interpret=True)
        np.testing.assert_array_equal(
            np.asarray(y_fused, np.float32), np.asarray(y_ref, np.float32)
        )

    def test_values_match_unfused_int8_view(self):
        x = _x(22, jnp.bfloat16)
        w = jnp.asarray(-1.1, jnp.float32)
        mean, mul, bias = self._affine(6, C)
        y_fused = plif_fused(
            x, T, w, spike_fn="atan", interpret=True, out_int8="view",
            affine=(mean, mul, bias),
        )
        assert y_fused.dtype == x.dtype
        xn = (((x - mean) * mul) + bias).astype(x.dtype)
        y_ref = plif_fused(xn, T, w, spike_fn="atan", interpret=True)
        np.testing.assert_array_equal(
            np.asarray(y_fused, np.float32), np.asarray(y_ref, np.float32)
        )

    def test_grads_match_unfused(self):
        x = _x(23, jnp.float32)
        w = jnp.asarray(-1.0, jnp.float32)
        mean, mul, bias = self._affine(7, C)
        g = jnp.asarray(
            np.random.default_rng(8).normal(size=x.shape), jnp.float32
        )

        def loss_fused(xx, ww, m, s, b):
            y = plif_fused(xx, T, ww, spike_fn="atan", interpret=True,
                           affine=(m, s, b))
            return (y * g).sum()

        def loss_ref(xx, ww, m, s, b):
            xn = ((xx - m) * s + b).astype(xx.dtype)
            y = plif_fused(xn, T, ww, spike_fn="atan", interpret=True)
            return (y * g).sum()

        gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
            x, w, mean, mul, bias
        )
        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
            x, w, mean, mul, bias
        )
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b_, np.float32),
                rtol=1e-5, atol=1e-5,
            )


def test_affine_grads_multiblock_grid():
    """Grid > 1 on the affine path: the (rt, 1) dm/ds/db outputs use a
    constant index_map and accumulate across sequential grid steps
    (plif_pallas._bwd_kernel_aff). H=W=8 gives R=1024, rt=512 -> 2 grid
    blocks, so a wrong accumulation (overwrite instead of +=) would halve
    the per-channel grads."""
    Hm = Wm = 8
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.normal(0.8, 0.8, (T * B, Hm, Wm, C)), jnp.float32)
    w = jnp.asarray(-1.0, jnp.float32)
    mean = jnp.asarray(rng.normal(0.1, 0.3, C), jnp.float32)
    mul = jnp.asarray(rng.normal(1.0, 0.2, C), jnp.float32)
    bias = jnp.asarray(rng.normal(0.0, 0.2, C), jnp.float32)
    g = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    from eas_snn_tpu.ops.plif_pallas import _aff_row_tile

    rt = _aff_row_tile(Hm * Wm, C, 16)
    assert rt and (Hm * Wm * C) // rt > 1, "fixture must span several blocks"

    def loss_fused(xx, ww, m, s, b):
        y = plif_fused(xx, T, ww, spike_fn="atan", interpret=True,
                       affine=(m, s, b))
        return (y * g).sum()

    def loss_ref(xx, ww, m, s, b):
        xn = ((xx - m) * s + b).astype(xx.dtype)
        y = plif_fused(xn, T, ww, spike_fn="atan", interpret=True)
        return (y * g).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w, mean, mul, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w, mean, mul, bias)
    for a, b_ in zip(gf, gr):
        # per-block partial sums reduce in a different order than the
        # reference's full-R reduction: pure f32 summation-order noise
        # (observed ~5e-5 relative on O(100) per-channel sums)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=5e-4, atol=5e-4,
        )


def test_batchnorm_fusable_matches_flax():
    """BatchNormFusable normalize mode is bit-identical to nn.BatchNorm
    (values, running-stats update, gradients)."""
    import flax.linen as fnn

    from eas_snn_tpu.models.blocks import BatchNormFusable

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0.3, 1.2, (6, 4, 4, 8)), jnp.bfloat16)

    ours = BatchNormFusable(momentum=0.97, epsilon=1e-3, dtype=jnp.bfloat16)
    ref = fnn.BatchNorm(momentum=0.97, epsilon=1e-3, dtype=jnp.bfloat16)
    v0 = ours.init(jax.random.PRNGKey(0), x, True)
    vr = ref.init(jax.random.PRNGKey(0), x, use_running_average=False)
    # same variable tree
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(vr)

    # nudge params off init to make the comparison non-trivial
    v0 = jax.tree_util.tree_map(
        lambda l: l + 0.1 if l.ndim == 1 else l, v0
    )
    y_o, m_o = ours.apply(v0, x, True, mutable=["batch_stats"])
    y_r, m_r = ref.apply(v0, x, use_running_average=False,
                         mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(y_o, np.float32),
                                  np.asarray(y_r, np.float32))
    for k in ("mean", "var"):
        np.testing.assert_array_equal(
            np.asarray(m_o["batch_stats"][k]),
            np.asarray(m_r["batch_stats"][k]),
        )
    # eval mode
    y_o = ours.apply(v0, x, False)
    y_r = ref.apply(v0, x, use_running_average=True)
    np.testing.assert_array_equal(np.asarray(y_o, np.float32),
                                  np.asarray(y_r, np.float32))

    def loss_ours(xx):
        y, _ = ours.apply(v0, xx, True, mutable=["batch_stats"])
        return (y.astype(jnp.float32) ** 2).sum()

    def loss_ref(xx):
        y, _ = ref.apply(v0, xx, use_running_average=False,
                         mutable=["batch_stats"])
        return (y.astype(jnp.float32) ** 2).sum()

    go = jax.grad(loss_ours)(x)
    gr = jax.grad(loss_ref)(x)
    np.testing.assert_array_equal(np.asarray(go, np.float32),
                                  np.asarray(gr, np.float32))


def test_fast_math_gradient_deviation_bounded(monkeypatch):
    """EAS_PLIF_FAST_MATH=1 (the TPU default) computes the atan
    surrogate's 1/(1+t^2) with the approximate-reciprocal instruction.
    The deviation from exact IEEE division must stay within ~2^-7
    relative on the input gradient — comparable to one bf16 rounding,
    i.e. inside the noise the deployment config already carries."""
    x = _x(1, jnp.float32)
    w = jnp.float32(-0.2)
    g = jnp.asarray(
        np.random.default_rng(9).normal(size=x.shape), jnp.float32
    )

    def loss(x, w):
        return (
            plif_fused(x, T, w, spike_fn="atan", alpha=2.0, interpret=True)
            * g
        ).sum()

    monkeypatch.setenv("EAS_PLIF_FAST_MATH", "0")
    dx_exact, dw_exact = jax.grad(loss, argnums=(0, 1))(x, w)
    monkeypatch.setenv("EAS_PLIF_FAST_MATH", "1")
    jax.clear_caches()  # the env is read at trace time
    dx_fast, dw_fast = jax.grad(loss, argnums=(0, 1))(x, w)
    # near-zero gradients make pure-relative comparison meaningless; the
    # absolute bound is what training sees (measured max |delta| ~5e-3 on
    # O(1) cotangents)
    np.testing.assert_allclose(
        np.asarray(dx_fast), np.asarray(dx_exact), rtol=2e-2, atol=1e-2
    )
    np.testing.assert_allclose(float(dw_fast), float(dw_exact), rtol=2e-2)
    # and it is actually a different code path (not silently exact)
    assert not np.array_equal(np.asarray(dx_fast), np.asarray(dx_exact))
