"""YOLOX building blocks, re-designed for TPU in Flax (NHWC, channel-last).

Spiking-vs-analog is a *constructor flag* (``NeuronCfg``) instead of the
reference's post-hoc module surgery (reference: yolox/utils/utils_snn.py:16-58
``convert_to_spiking``): when ``neuron.spiking`` is true, every activation is
a ParametricLIF neuron scanning over ``T`` time steps and all convs/BN apply
with time folded into the batch axis (the reference's ``SeqToANNContainer`` /
``tdLayer`` trick, yolox/models/layer.py:122-132) — a single large MXU conv
per layer instead of T small ones.

Block topology parity: BaseConv/DWConv/Bottleneck/SPPBottleneck/CSPLayer/Focus
(reference: yolox/models/network_blocks.py:31-213). BatchNorm uses
eps=1e-3, momentum=0.03 as set by ``init_yolo``
(reference: yolox/exp/event_yolox_base.py:179-183); in spiking mode the BN
statistics are computed over (T·B, H, W), matching spikingjelly's multi-step
``BatchNorm2d`` (step_mode='m').
"""

from __future__ import annotations

import os
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.lif import PLIF_W_INIT, plif_scan
from ..ops.surrogate import get_spike_fn

__all__ = [
    "NeuronCfg",
    "ANN",
    "PLIF",
    "BaseConv",
    "DWConv",
    "Bottleneck",
    "SPPBottleneck",
    "CSPLayer",
    "Focus",
    "upsample2x",
]


class NeuronCfg(NamedTuple):
    """How activations behave: analog nonlinearity or spiking PLIF over T.

    ``asgl_p`` / ``alpha_granularity`` only engage for spike_fn='patan'
    (ASGL): the mixing probability of EfficientNoisySpikeII and the
    granularity of its learnable InvArcTanh temperature — 'layer' (scalar,
    the reference's reachable config), 'channel' ((C,)) or 'neuron'
    ((H, W, C)) following the InvRectangle/InvSigmoid granularity scheme
    (reference: yolox/models/activation.py:73-83, 181-205)."""

    spiking: bool = False
    T: int = 1
    spike_fn: str = "atan"
    alpha: float = 2.0
    asgl_p: float = 0.0
    alpha_granularity: str = "layer"

    @staticmethod
    def ann() -> "NeuronCfg":
        return NeuronCfg(False, 1, "atan", 2.0)

    @staticmethod
    def snn(T: int, spike_fn: str = "atan", alpha: float = 2.0,
            asgl_p: float = 0.0,
            alpha_granularity: str = "layer") -> "NeuronCfg":
        return NeuronCfg(True, T, spike_fn, alpha, asgl_p, alpha_granularity)


def analog_act(name: str, x: jnp.ndarray) -> jnp.ndarray:
    if name == "silu":
        return jax.nn.silu(x)
    if name == "relu":
        return jax.nn.relu(x)
    if name == "lrelu":
        return jax.nn.leaky_relu(x, 0.1)
    if name == "idnt":
        return x
    raise AttributeError(f"Unsupported act type: {name}")


class PLIF(nn.Module):
    """Parametric-LIF activation over T steps folded in the batch axis.

    Input/output (T*B, H, W, C); one learnable scalar decay logit per layer
    (spikingjelly ParametricLIFNode semantics, see ops/lif.py).

    On TPU the T-step recurrence runs as a fused Pallas kernel
    (ops/plif_pallas.py) — one HBM read + one write instead of the XLA
    scan's per-step carry materialization (measured 3x per conv site);
    forward and backward are both fused, with gradient equivalence tested
    in tests/test_plif_pallas.py.
    """

    T: int
    spike_fn: str = "atan"
    alpha: float = 2.0
    thresh: float = 1.0
    asgl_p: float = 0.0  # ASGL mixing prob (patan only)
    alpha_granularity: str = "layer"  # patan learnable-alpha granularity
    fuse: str = "auto"  # 'auto' (Pallas on TPU) | 'never' | 'interpret'
    # Spike storage: spikes are exactly 0/1, so int8 storage is
    # bit-lossless and halves the HBM-bound backbone's spike traffic.
    # At eval the kernel returns int8 directly; in training it stores
    # int8 but returns a float convert VIEW (XLA fuses the convert into
    # the consuming conv and its wgrad — both read the int8 buffer)
    # while the custom_vjp backward recomputes from the f32 preact, so
    # gradients are unchanged.
    eval_store: str = "int8"   # 'int8' | 'float'
    train_store: str = "int8"  # 'int8' (convert view) | 'float'

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 affine=None, conv1x1=None, conv3x3=None) -> jnp.ndarray:
        w = self.param("w", lambda _: jnp.asarray(PLIF_W_INIT, jnp.float32))
        from ..ops.plif_pallas import plif_fused, plif_fused_supported

        # A/B switches (like EAS_CONV_PLIF_FUSE / EAS_BN_AFFINE_FUSE):
        # EAS_PLIF_FUSE=0 forces the XLA scan path, EAS_SPIKE_STORE=float
        # disables int8 spike storage — together with compute_dtype=float32
        # they give the pure-f32 reference arithmetic that the AP-drift
        # experiment (tools/ap_drift.py) baselines against.
        eval_store = os.environ.get("EAS_SPIKE_STORE", self.eval_store)
        train_store = os.environ.get("EAS_SPIKE_STORE", self.train_store)
        # ASGL ('patan') eval forward is the plain hard >= threshold
        # (EfficientNoisySpikeII.forward eval branch, reference
        # activation.py:196-200) — identical to atan's forward — so the
        # fused kernels serve it at eval; training needs the learnable-
        # alpha straight-through closure, which only the scan path runs.
        kind = "atan" if self.spike_fn == "patan" else self.spike_fn
        use_fused = os.environ.get("EAS_PLIF_FUSE", "1") != "0" and (
            self.fuse == "interpret" or (
                self.fuse == "auto"
                and jax.default_backend() == "tpu"
                and kind in ("atan", "rect", "sigmoid", "tanh")
                and (self.spike_fn != "patan" or not train)
            )
        )
        if conv1x1 is not None or conv3x3 is not None:
            # eval-only: the whole conv (+ folded BN) runs inside the
            # PLIF kernel — x here is the CONV INPUT (previous layer's
            # spikes, int8 at eval), and the preact never touches HBM.
            from ..ops import conv_plif_pallas as cpp

            if conv1x1 is not None:
                w_mat, bias_eff, float_dt = conv1x1
                c_out = w_mat.shape[0]
                fused, ref, sup = (
                    cpp.conv1x1_plif_fused, cpp.conv1x1_plif_reference,
                    cpp.conv1x1_plif_supported,
                )
            else:
                w_mat, bias_eff, float_dt, stride = conv3x3
                c_out = w_mat.shape[1]
                fused, ref, sup = (
                    (cpp.conv3x3_plif_fused, cpp.conv3x3_plif_reference,
                     cpp.conv3x3_plif_supported)
                    if stride == 1 else
                    (cpp.conv3x3s2_plif_fused, cpp.conv3x3s2_plif_reference,
                     cpp.conv3x3s2_plif_supported)
                )
            out_dt = jnp.int8 if eval_store == "int8" else float_dt
            kw = dict(thresh=self.thresh, spike_fn=kind, out_dtype=out_dt)
            if isinstance(x, (tuple, list)):  # virtual concat (1x1 only)
                shapes = tuple(t.shape for t in x)
                dts = tuple(t.dtype for t in x)
            else:
                shapes, dts = x.shape, x.dtype
            if use_fused and sup(shapes, self.T, c_out, dts, out_dtype=out_dt):
                return fused(
                    x, w_mat, bias_eff, self.T, w,
                    interpret=self.fuse == "interpret", **kw,
                )
            return ref(x, w_mat, bias_eff, self.T, w, **kw)
        if use_fused and plif_fused_supported(x.shape, self.T, x.dtype):
            if train:
                store = "view" if train_store == "int8" else False
            else:
                store = "direct" if eval_store == "int8" else False
            return plif_fused(
                x, self.T, w, thresh=self.thresh, spike_fn=kind,
                alpha=self.alpha, interpret=self.fuse == "interpret",
                out_int8=store, affine=affine,
            )
        if affine is not None:
            # fallback: apply the BN normalize here, exactly as the
            # unfused path would (f32 expression, storage-dtype round)
            mean, mul, bias = affine
            x = ((x - mean) * mul + bias).astype(x.dtype)
        if self.spike_fn == "patan":
            # ASGL: learnable InvArcTanh temperature + stochastic
            # hard/smooth mixing (reference activation.py:121-131 InvArcTanh
            # — always an nn.Parameter for patan, event_yolox_base.py:148 —
            # and :181-205 EfficientNoisySpikeII). Granularity follows the
            # InvRectangle scheme (:73-83): 'layer' scalar, 'channel' (C,),
            # 'neuron' per-position (H, W, C) = torch ones_like(x[0]).
            from ..ops.surrogate import asgl_spike

            if self.alpha_granularity == "layer":
                shp = (1,)
            elif self.alpha_granularity == "channel":
                shp = (x.shape[-1],)
            elif self.alpha_granularity == "neuron":
                shp = tuple(x.shape[1:])
            else:
                raise NotImplementedError(
                    f"granularity '{self.alpha_granularity}'")
            alpha_p = self.param(
                "alpha", lambda _: jnp.full(shp, self.alpha, jnp.float32))
            p_eff = float(self.asgl_p) if train else 0.0
            # mask randomness comes from the 'spikes' rng stream (the
            # train step folds the global step in); without one the mix
            # degrades to p=0 (hard forward, smooth grad)
            key = (self.make_rng("spikes")
                   if p_eff > 0.0 and self.has_rng("spikes") else None)
            av = alpha_p.astype(x.dtype)

            def fn(xx, _a=av, _p=p_eff, _k=key, _t=train):
                return asgl_spike(xx, _a, p=_p, key=_k, training=_t)
        else:
            fn = get_spike_fn(self.spike_fn, self.alpha)
        tb = x.shape[0]
        b = tb // self.T
        xs = x.reshape((self.T, b) + x.shape[1:])
        spikes, _ = plif_scan(xs, w.astype(x.dtype), fn, self.thresh)
        return spikes.reshape(x.shape)


class ANN(nn.Module):
    name_: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        return analog_act(self.name_, x)


class BatchNormFusable(nn.Module):
    """Drop-in replica of ``flax.linen.BatchNorm`` (channel-last subset:
    axis=-1, use_scale/use_bias, force_float32_reductions) that can hand
    out the per-channel (mean, mul, bias) triple instead of normalizing,
    so the train-mode normalize can run INSIDE the fused PLIF kernel
    (ops/plif_pallas.py:_fwd_kernel_aff) and the separate BN elementwise
    pass — one full-tensor read + write per spiking conv site — drops out
    of the HBM-bound train forward/backward.

    Variable names/shapes/order and arithmetic (f32 fast-variance stats,
    ``(x - mean) * rsqrt(var+eps) * scale + bias`` expression order, final
    cast) mirror flax's ``_compute_stats``/``_normalize`` exactly, so
    checkpoints and the torch importer see an identical tree and the
    normalize mode is bit-identical to ``nn.BatchNorm``.
    """

    momentum: float = 0.97
    epsilon: float = 1e-3
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool, mode: str = "normalize"):
        f32 = jnp.float32
        C = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), f32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), f32)
        )
        if train and os.environ.get("EAS_BN_FROZEN") == "1":
            # measurement-only ablation (tools/profile_train.py): frozen
            # running stats in train mode bound what the batch-stats
            # compute + its backward cost in the train step. NOT a
            # training mode — gradients differ from true BN.
            train = False
        if train:
            cdt = jnp.promote_types(self.dtype or x.dtype, f32)
            xf = x.astype(cdt)
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axes)
            mean2 = (xf * xf).mean(axes)
            var = jnp.maximum(0.0, mean2 - mean * mean)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        scale = self.param("scale", nn.initializers.ones, (C,), f32)
        bias = self.param("bias", nn.initializers.zeros, (C,), f32)
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        if mode == "affine":
            return mean, mul, bias
        y = (x - mean) * mul + bias
        out_dt = self.dtype or jnp.result_type(x, scale, bias)
        return y.astype(out_dt)


def make_act(neuron: NeuronCfg, act: str) -> nn.Module:
    if neuron.spiking:
        return PLIF(T=neuron.T, spike_fn=neuron.spike_fn, alpha=neuron.alpha,
                    asgl_p=neuron.asgl_p,
                    alpha_granularity=neuron.alpha_granularity)
    return ANN(name_=act)


class BaseConv(nn.Module):
    """Conv -> BN -> activation (reference network_blocks.py:31-56)."""

    out_channels: int
    ksize: int
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    neuron: NeuronCfg = NeuronCfg.ann()
    dtype: object = jnp.float32  # compute dtype (bf16 for MXU throughput)

    def _conv_plif_eligible(self, x0, train: bool, out_dtype=jnp.int8) -> bool:
        """Eval-time whole-site fusion gate: 1x1 or 3x3, stride-1,
        ungrouped spiking conv whose input geometry the fused
        conv+BN+PLIF kernel supports (ops/conv_plif_pallas.py), on the
        TPU backend, outside init (init must trace the unfused path so
        every param is created)."""
        if train or not self.neuron.spiking or self.is_initializing():
            return False
        if self.ksize not in (1, 3) or self.groups != 1:
            return False
        if self.stride not in (1, 2) or (self.ksize, self.stride) == (1, 2):
            return False
        # Engagement is decided per geometry by the MEASURED policy table
        # (ops/conv_plif_policy.py — fusing everything was a wash at the
        # backbone level; per-site selection is the optimum). Env
        # EAS_CONV_PLIF_FUSE overrides: 'auto' (table) | '0' | '1' |
        # '1x1' | '3x3'.
        from ..ops.conv_plif_policy import should_fuse

        shapes0 = (tuple(t.shape for t in x0)
                   if isinstance(x0, (tuple, list)) else x0.shape)
        if not should_fuse(self.ksize, self.stride, shapes0,
                           self.out_channels):
            return False
        from ..ops import conv_plif_pallas as cpp

        if isinstance(x0, (tuple, list)):
            if self.ksize != 1:
                return False
            shapes = tuple(t.shape for t in x0)
            dts = tuple(t.dtype for t in x0)
            ok = cpp.conv1x1_plif_supported(
                shapes, self.neuron.T, self.out_channels, dts,
                out_dtype=out_dtype,
            )
        else:
            sup = (cpp.conv1x1_plif_supported if self.ksize == 1
                   else (cpp.conv3x3_plif_supported if self.stride == 1
                         else cpp.conv3x3s2_plif_supported))
            ok = sup(x0.shape, self.neuron.T, self.out_channels, x0.dtype,
                     out_dtype=out_dtype)
        if not ok:
            return False
        return jax.default_backend() == "tpu"

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        # ``x`` may be a tuple of same-(TB,H,W) tensors: a channel concat.
        # The unfused path concatenates here; the fused eval path hands the
        # pieces to the kernel, which sums one MXU dot per piece — the
        # concatenated tensor is then never materialized in HBM.
        x0 = x  # pre-cast input: the fused conv kernel reads int8 directly
        if isinstance(x, (tuple, list)):
            x = jnp.concatenate(x, axis=-1)
        x = x.astype(self.dtype)
        # Synaptic-op / MAC accounting for the energy estimator
        # (reference: yolox/evaluators/event_evaluator.py:466-565 replays
        # layers with all-ones weights via forward hooks; here the
        # equivalent ones-kernel conv is sown into the 'sops' collection —
        # dead code unless apply() makes 'sops' mutable, so it costs
        # nothing in normal runs).
        k, g = self.ksize, self.groups
        in_ch = x.shape[-1]
        # ones-kernel coverage conv: each |input| weighted by how many
        # output windows tap it; × fan-out channels = exact synaptic ops
        # (for depthwise g=in_ch the fan-out is 1, also exact)
        ones_k = jnp.ones((k, k, in_ch, 1), x.dtype)
        coverage = jax.lax.conv_general_dilated(
            jnp.abs(x), ones_k, (self.stride, self.stride),
            [((k - 1) // 2,) * 2] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        sops = coverage.sum() * (self.out_channels // g)
        out_hw = coverage.shape[0] * coverage.shape[1] * coverage.shape[2]
        macs = float(out_hw) * k * k * (in_ch // g) * self.out_channels
        self.sow(
            "sops", "ops",
            jnp.stack([sops.astype(jnp.float32),
                       jnp.asarray(macs, jnp.float32),
                       jnp.asarray(float(self.neuron.spiking), jnp.float32)]),
        )
        bn = BatchNormFusable(
            momentum=0.97, epsilon=1e-3, dtype=self.dtype, name="bn"
        )
        act = make_act(self.neuron, self.act)
        # the fused site's output dtype (what the consuming layer reads):
        # int8 spike storage by default, the conv compute dtype otherwise
        site_out_dt = (
            jnp.int8
            if getattr(act, "eval_store", "int8") == "int8" else self.dtype
        )
        if self._conv_plif_eligible(x0, train, out_dtype=site_out_dt):
            # whole-site fusion: fold the eval BN into the conv weights
            # (same algebra as utils/model_surgery.py:fuse_conv_bn) and run
            # conv + affine + PLIF in one kernel — the bf16 preact never
            # round-trips HBM. ``self.variables`` reads the already-created
            # params (the unfused trace below creates them at init).
            wk = self.variables["params"]["conv"]["kernel"]
            mean, mul, bias_ = bn(
                jnp.zeros((1, 1, 1, self.out_channels), self.dtype),
                False, mode="affine",
            )
            bias_eff = bias_ - mean * mul
            if self.ksize == 1:
                w_oc = (wk[0, 0].astype(jnp.float32) * mul[None, :]).T
                return act(x0, train, conv1x1=(w_oc, bias_eff, self.dtype))
            from ..ops.conv_plif_pallas import fold_conv3x3

            w3 = fold_conv3x3(wk, mul)
            return act(
                x0, train,
                conv3x3=(w3, bias_eff, self.dtype, self.stride),
            )
        x = nn.Conv(
            self.out_channels,
            (self.ksize, self.ksize),
            strides=self.stride,
            padding=[( (self.ksize - 1) // 2,) * 2] * 2,
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        import os

        if (self.neuron.spiking and train
                and os.environ.get("EAS_BN_AFFINE_FUSE", "1") != "0"):
            # train-mode BN normalize fused into the PLIF kernel: the
            # separate elementwise pass (full-tensor read+write) drops
            # out of the HBM-bound spiking-site chain. Values bitwise
            # equal to the unfused path (see BatchNormFusable docstring).
            return act(x, train, affine=bn(x, train, mode="affine"))
        return act(bn(x, train), train)


class DWConv(nn.Module):
    """Depthwise conv + pointwise conv (reference network_blocks.py:59-78)."""

    out_channels: int
    ksize: int
    stride: int = 1
    act: str = "silu"
    neuron: NeuronCfg = NeuronCfg.ann()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = BaseConv(
            in_ch, self.ksize, self.stride, groups=in_ch, act=self.act,
            neuron=self.neuron, dtype=self.dtype, name="dconv",
        )(x, train)
        return BaseConv(
            self.out_channels, 1, 1, act=self.act, neuron=self.neuron, dtype=self.dtype,
            name="pconv",
        )(x, train)


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 conv, optional additive (SEW-style) shortcut
    (reference network_blocks.py:81-104)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    neuron: NeuronCfg = NeuronCfg.ann()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        y = BaseConv(hidden, 1, 1, act=self.act, neuron=self.neuron, dtype=self.dtype, name="conv1")(
            x, train
        )
        Conv = DWConv if self.depthwise else BaseConv
        y = Conv(self.out_channels, 3, 1, act=self.act, neuron=self.neuron, dtype=self.dtype, name="conv2")(
            y, train
        )
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


def _max_pool_sep(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Stride-1 same-padded k x k max pool as two 1-D pools (rows then
    cols). Max is separable, so the values are bitwise identical to the
    2-D pool; the BACKWARD becomes two 1-D ``select_and_scatter`` ops with
    k-element windows instead of one with a k*k window."""
    p = [(k // 2, k // 2)]
    x = nn.max_pool(x, (k, 1), strides=(1, 1), padding=p + [(0, 0)])
    return nn.max_pool(x, (1, k), strides=(1, 1), padding=[(0, 0)] + p)


def spp_pools(x: jnp.ndarray, kernel_sizes: Sequence[int]) -> list:
    """The SPP pyramid's stride-1 max pools (reference
    network_blocks.py:131-137 ``nn.MaxPool2d`` at 5/9/13), computed as a
    CHAIN of separable pools: ``pool_{k+d}(x) == pool_{d+1}(pool_k(x))``
    for stride-1 same (-inf) padding, so pool13 rides on pool9 rides on
    pool5 and every stage decomposes into 1-D row/col pools.

    Values are bitwise identical to the direct 2-D pools. Gradients differ
    ONLY in tie attribution: ``select_and_scatter`` routes each window's
    cotangent to its first (row-major) max, and the chain reaches a
    different — equally arbitrary — member of the tied set. On spike
    tensors (values in {0,1}) ties are pervasive, and the direct 13x13
    backward was the single most expensive HLO of the flagship train step
    (select_and_scatter, 18.1 ms of 312 ms at B=128 — BENCHMARKS.md round
    5); the chain cuts its window work ~9x. ``EAS_SPP_CHAIN=0`` restores
    the reference formulation.
    """
    if os.environ.get("EAS_SPP_CHAIN", "1") == "0":
        return [
            nn.max_pool(x, (k, k), strides=(1, 1),
                        padding=[(k // 2, k // 2)] * 2)
            for k in kernel_sizes
        ]
    pools = []
    prev_k, y = 0, x
    for k in kernel_sizes:
        d = k - prev_k + 1 if prev_k else k
        if d < 1 or d % 2 == 0:  # non-composable ladder: pool directly
            y, d = x, k
        y = _max_pool_sep(y, d)
        pools.append(y)
        prev_k = k
    return pools


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (reference network_blocks.py:125-147)."""

    out_channels: int
    kernel_sizes: Tuple[int, ...] = (5, 9, 13)
    act: str = "silu"
    neuron: NeuronCfg = NeuronCfg.ann()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = BaseConv(hidden, 1, 1, act=self.act, neuron=self.neuron, dtype=self.dtype, name="conv1")(
            x, train
        )
        pools = spp_pools(x, self.kernel_sizes)
        return BaseConv(
            self.out_channels, 1, 1, act=self.act, neuron=self.neuron,
            dtype=self.dtype, name="conv2"
        )(tuple([x] + pools), train)


class CSPLayer(nn.Module):
    """C3: cross-stage partial bottleneck stack
    (reference network_blocks.py:150-188)."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    neuron: NeuronCfg = NeuronCfg.ann()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ``x`` may be a tuple (an unmaterialized channel concat, e.g. the
        # PAFPN upsample||lateral merge): conv1/conv2 are 1x1 BaseConvs,
        # which fold the pieces into the fused kernel at eval.
        hidden = int(self.out_channels * self.expansion)
        x1 = BaseConv(hidden, 1, 1, act=self.act, neuron=self.neuron, dtype=self.dtype, name="conv1")(
            x, train
        )
        x2 = BaseConv(hidden, 1, 1, act=self.act, neuron=self.neuron, dtype=self.dtype, name="conv2")(
            x, train
        )
        for i in range(self.n):
            x1 = Bottleneck(
                hidden,
                shortcut=self.shortcut,
                expansion=1.0,
                depthwise=self.depthwise,
                act=self.act,
                neuron=self.neuron,
                dtype=self.dtype,
                name=f"m{i}",
            )(x1, train)
        # handed as a tuple: BaseConv concatenates on the unfused path and
        # folds the pieces into the fused kernel's contraction at eval
        return BaseConv(
            self.out_channels, 1, 1, act=self.act, neuron=self.neuron, dtype=self.dtype, name="conv3"
        )((x1, x2), train)


class Focus(nn.Module):
    """Space-to-depth stem: (H, W, C) -> (H/2, W/2, 4C) -> conv
    (reference network_blocks.py:191-213; channel order TL, BL, TR, BR)."""

    out_channels: int
    ksize: int = 1
    stride: int = 1
    act: str = "silu"
    neuron: NeuronCfg = NeuronCfg.ann()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        tl = x[..., ::2, ::2, :]
        tr = x[..., ::2, 1::2, :]
        bl = x[..., 1::2, ::2, :]
        br = x[..., 1::2, 1::2, :]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return BaseConv(
            self.out_channels, self.ksize, self.stride, act=self.act,
            neuron=self.neuron, dtype=self.dtype, name="conv",
        )(x, train)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x spatial upsample for NHWC."""
    x = jnp.repeat(x, 2, axis=-3)
    return jnp.repeat(x, 2, axis=-2)
