"""Event-to-frame embedding front ends (the adaptive sampling layer family).

Flax counterparts of the reference's four embeddings (reference:
yolox/models/embedding.py): ``count`` (micro-frame sum), ``snn`` (feedforward
LIF), ``rsnn`` (gated recurrent LIF), and ``arsnn`` (the adaptive sampler —
see ops/arsnn.py for the core scan).

Input convention is channel-last: events arrive as (B, Tl, Tm, H, W, C);
macro-slices Tl are folded into batch, micro-steps Tm are scanned (in
*reversed* order, matching embedding.py:155-156), and outputs are
(Ts, B*Tl, H, W, C) for arsnn or (B*Tl, H, W, C) otherwise.

The recurrent gate convolutions run *inside* a ``lax.scan``, so their weights
are declared as explicit params and applied through a pure
``lax.conv_general_dilated`` closure (linen submodules cannot be invoked
under jax control flow during init).

Init parity: input convs use orthogonal init with ReLU gain; gate convs use
fan-in uniform (kaiming, sigmoid gain) — embedding.py:121-130.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.arsnn import arsnn_scan, gated_lif_update
from ..ops.arsnn_pallas import arsnn_scan_fused
from ..ops.lif import lif_step
from ..ops.pack import (
    depth_to_space,
    pack_bias,
    pack_conv_kernel,
    packable,
    space_to_depth,
)
from ..ops.surrogate import get_spike_fn

__all__ = [
    "SpikeCountEmbedding",
    "LIFEmbedding",
    "RSNNEmbedding",
    "ARSNNEmbedding",
    "build_embedding",
    "logit_decay",
]


def logit_decay(decay: float) -> float:
    """Store decay as a logit so sigmoid(param) is the effective decay
    (reference: yolox/utils/util.py:278-280 warp_decay)."""
    return math.log(decay / (1.0 - decay))


_ORTHO = jax.nn.initializers.orthogonal(scale=math.sqrt(2.0))
_KAIMING_SIGMOID = jax.nn.initializers.variance_scaling(1.0, "fan_in", "uniform")
_ZEROS = jax.nn.initializers.zeros


def _conv_stack_fn(
    mdl: nn.Module,
    name: str,
    in_ch: int,
    out_ch: int,
    ksize: int,
    depth: int,
    kernel_init,
    dtype=None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Declare conv[ReLU conv]*(depth-1) params on ``mdl`` and return a pure
    apply closure safe to call inside lax.scan
    (reference build_conv: embedding.py:106-111).

    ``dtype`` sets the conv compute dtype (bf16 for MXU throughput); the
    result is cast back to the input dtype so the neuron dynamics
    (threshold crossings, membrane integrals) stay in float32."""
    weights = []
    for i in range(depth):
        ic = in_ch if i == 0 else out_ch
        k = mdl.param(f"{name}_kernel{i}", kernel_init, (ksize, ksize, ic, out_ch))
        b = mdl.param(f"{name}_bias{i}", _ZEROS, (out_ch,))
        weights.append((k, b))

    apply = _make_conv_stack_apply(weights, [(ksize // 2,) * 2] * 2, dtype)
    apply.weights = weights  # raw (kernel HWIO, bias) pairs for fused paths
    return apply


def _make_conv_stack_apply(weights, pad, dtype):
    """conv[ReLU conv]* closure shared by the stencil and packed paths —
    the two MUST stay numerically identical, so there is one body."""

    def apply(x: jnp.ndarray) -> jnp.ndarray:
        out_dtype = x.dtype
        cdt = dtype or out_dtype
        x = x.astype(cdt)
        for i, (k, b) in enumerate(weights):
            if i > 0:
                x = jax.nn.relu(x)
            x = jax.lax.conv_general_dilated(
                x, k.astype(cdt), (1, 1), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(cdt)
        return x.astype(out_dtype)

    return apply


def _packed_conv_apply(weights, block: int, dtype=None):
    """Packed-space (space-to-depth) conv stack equivalent to the stack
    defined by ``weights`` — see ops/pack.py. One 3x3 conv with full lane
    channels replaces each small-channel stencil conv."""
    packed = [
        (pack_conv_kernel(k, block), pack_bias(b, block)) for k, b in weights
    ]
    return _make_conv_stack_apply(packed, [(1, 1), (1, 1)], dtype)


def _fold_time(events: jnp.ndarray) -> jnp.ndarray:
    """(B, Tl, Tm, H, W, C) -> time-major reversed (Tm, B*Tl, H, W, C)."""
    if events.ndim == 5:  # (B, Tm, H, W, C)
        ev = events
    elif events.ndim == 6:
        B, Tl, Tm = events.shape[:3]
        ev = events.reshape((B * Tl,) + events.shape[2:])
    else:
        raise ValueError(f"expected 5/6-dim events, got {events.shape}")
    ev = jnp.moveaxis(ev, 1, 0)      # (Tm, N, H, W, C)
    return ev[::-1]                   # reverse time (embedding.py:155-156)


class SpikeCountEmbedding(nn.Module):
    """Sum event micro-frames over time (reference embedding.py:9-24)."""

    @nn.compact
    def __call__(self, events: jnp.ndarray) -> jnp.ndarray:
        return _fold_time(events).sum(axis=0)


class LIFEmbedding(nn.Module):
    """Feedforward conv + LIF over Tm steps; 'sum' readout integrates the
    no-reset membrane (reference embedding.py:28-76)."""

    ksize: int = 7
    in_channels: int = 2
    out_channels: int = 2
    depth: int = 1
    readout: str = "sum"
    thresh: float = 1.0
    vreset: Optional[float] = 0.0
    decay: float = 0.5
    spike_fn: str = "rect"
    alpha: float = 1.0

    @nn.compact
    def __call__(self, events: jnp.ndarray) -> jnp.ndarray:
        ev = _fold_time(events)
        conv = _conv_stack_fn(
            self, "conv", self.in_channels, self.out_channels, self.ksize,
            self.depth, _ORTHO,
        )
        # one fused conv over all steps (tdLayer trick, layer.py:122-132)
        psp = conv(ev.reshape((-1,) + ev.shape[2:])).reshape(
            ev.shape[:-1] + (self.out_channels,)
        )
        decay = self.param(
            "decay", lambda _: jnp.asarray(logit_decay(self.decay), jnp.float32)
        )
        fn = get_spike_fn(self.spike_fn, self.alpha)

        def step(carry, x):
            v, vsum = carry
            v, vn, _ = lif_step(v, x, decay.astype(x.dtype), self.thresh, self.vreset, fn)
            return (v, vsum + vn), None

        zero = jnp.zeros_like(psp[0])
        (v, vsum), _ = jax.lax.scan(step, (zero, zero), psp, unroll=True)
        if self.readout == "sum":
            return vsum
        if self.readout == "last":
            return v
        raise NotImplementedError(self.readout)


class RSNNEmbedding(nn.Module):
    """Gated recurrent LIF without segmentation ('rsnn',
    reference embedding.py:229-316 SpikingEmbedding)."""

    ksize: int = 7
    in_channels: int = 2
    out_channels: int = 2
    depth: int = 1
    readout: str = "sum"
    use_relu: bool = False
    thresh: float = 1.0
    vreset: Optional[float] = 0.0
    spike_fn: str = "rect"
    alpha: float = 1.0

    @nn.compact
    def __call__(self, events: jnp.ndarray) -> jnp.ndarray:
        ev = _fold_time(events)
        C = self.out_channels
        input_conv = _conv_stack_fn(
            self, "input_conv", self.in_channels, 2 * C, self.ksize,
            self.depth, _ORTHO,
        )
        gate_conv = _conv_stack_fn(
            self, "gate_conv", C, 2 * C, self.ksize, self.depth,
            _KAIMING_SIGMOID,
        )
        inp = input_conv(ev.reshape((-1,) + ev.shape[2:])).reshape(
            ev.shape[:-1] + (2 * C,)
        )
        gs_in, cs_in = jnp.split(inp, 2, axis=-1)
        fn = get_spike_fn(self.spike_fn, self.alpha)

        def step(carry, xs):
            v, spike, vsum = carry
            g_in, c_in = xs
            g_rec, c_rec = jnp.split(gate_conv(spike), 2, axis=-1)
            gate = jax.nn.sigmoid(g_in + g_rec)
            v, vn, spike = gated_lif_update(
                v, gate, c_in + c_rec, self.thresh, self.vreset, fn
            )
            return (v, spike, vsum + vn), None

        zero = jnp.zeros(gs_in.shape[1:], ev.dtype)
        (v, _, vsum), _ = jax.lax.scan(
            step, (zero, zero, zero), (gs_in, cs_in), unroll=True
        )
        out = vsum if self.readout == "sum" else v
        if self.use_relu:
            out = jax.nn.relu(out)
        return out


class ARSNNEmbedding(nn.Module):
    """The adaptive sampler (reference embedding.py:79-226); returns a
    (Ts, B*Tl, H, W, C) stack of learned temporal slices."""

    ksize: int = 7
    in_channels: int = 2
    out_channels: int = 2
    Ts: int = 1
    depth: int = 1
    readout: str = "sum"
    spike_attach: bool = False
    write_zero: bool = False
    use_abs: bool = False
    # split=True declares input_conv_agg/gate_conv_agg parameters exactly as
    # the reference does (embedding.py:100-102,129-130) — but the reference's
    # forward NEVER uses them (the call sites are commented out at :163-165),
    # so they are checkpoint-compatibility ballast here too.
    split: bool = False
    thresh: float = 1.0
    vreset: Optional[float] = 0.0
    spike_fn: str = "rect"
    alpha: float = 1.0
    # conv compute dtype (None -> input dtype); neuron dynamics stay f32
    dtype: object = None
    # scan state dtype (None -> input dtype, i.e. f32). 'bfloat16' halves
    # the scan's HBM carry traffic (the sampler is bandwidth-bound); spikes
    # are chaotic at threshold edges so outputs deviate elementwise from
    # the f32 path — opt-in, for throughput-critical eval.
    state_dtype: Optional[str] = None
    # 'never' (default) | 'always' | 'auto'. Honest forced-materialization
    # profiling on the v5e shows XLA's own scan fusion beating the per-step
    # Pallas kernel (~13 vs ~49 ms device time for the Gen1-M embedding), so
    # the fused kernel stays opt-in until the whole-scan-resident redesign.
    use_pallas: str = "never"
    # per-step jax.checkpoint inside the sampler scan (see ops/arsnn.py);
    # forward-identical, backward recomputes step internals from carries
    remat: bool = False
    # 'never' | 'auto': run the ENTIRE scan in space-to-depth packed
    # layout (ops/pack.py) — the C=2 5x5 stencils become packed-channel
    # 3x3 convs on the MXU. Exactly the same math (weights transformed by
    # a differentiable gather), float-association differs.
    packed: str = "never"
    # Packing block. Measured on a v5e at flagship geometry (B=128, bf16
    # state, Tm=4): blk=4 is the sweet spot — 9.1 ms vs 15.6 unpacked vs
    # 15.9 at blk=8 vs 9.9 at blk=2. blk=8 inflates the tap count 10.2x
    # (16x16 covered area / 25 true taps) which cancels its full-lane MXU
    # utilization; blk=4 inflates only 2.56x at K=128-deep dots.
    packed_block: int = 4

    @nn.compact
    def __call__(self, events: jnp.ndarray, record: bool = False,
                 train: bool = False):
        ev = _fold_time(events)
        in_dtype = ev.dtype
        if self.state_dtype is not None:
            ev = ev.astype(self.state_dtype)
        C = self.out_channels
        input_conv = _conv_stack_fn(
            self, "input_conv", self.in_channels, 2 * C, self.ksize,
            self.depth, _ORTHO, dtype=self.dtype,
        )
        gate_conv = _conv_stack_fn(
            self, "gate_conv", C, 2 * C, self.ksize, self.depth,
            _KAIMING_SIGMOID, dtype=self.dtype,
        )
        if self.split:
            # unused-by-forward parameters, matching the reference's
            # checkpoint layout (init scheme swapped vs the main convs,
            # reference embedding.py:129-130)
            _conv_stack_fn(
                self, "input_conv_agg", self.in_channels, 2 * C,
                self.ksize, 1, _KAIMING_SIGMOID,
            )
            _conv_stack_fn(
                self, "gate_conv_agg", C, 2 * C, self.ksize, 1, _ORTHO,
            )
        kw = dict(
            remat=self.remat,
            Ts=self.Ts,
            thresh=self.thresh,
            vreset=self.vreset,
            spike_fn=get_spike_fn(self.spike_fn, self.alpha),
            readout=self.readout,
            spike_attach=self.spike_attach,
            write_zero=self.write_zero,
            use_abs=self.use_abs,
        )
        if (
            self.packed == "auto"
            and not record
            and packable(ev.shape[2], ev.shape[3], self.ksize,
                         self.packed_block)
        ):
            blk = self.packed_block
            ev_p = space_to_depth(ev, blk)
            kw_p = dict(kw)
            agg_p = arsnn_scan(
                ev_p,
                _packed_conv_apply(input_conv.weights, blk, dtype=self.dtype),
                _packed_conv_apply(gate_conv.weights, blk, dtype=self.dtype),
                **kw_p,
            )
            return depth_to_space(agg_p, blk, C).astype(in_dtype)
        if self.use_pallas in ("always", "auto"):
            from ..ops.arsnn_pallas import arsnn_fused_v2, v2_supported

            Tm, _, Hh, Ww, Cin = ev.shape
            ok = v2_supported(
                Tm, Cin, C, Hh, Ww, self.depth, self.ksize, record,
                Ts=self.Ts,
            ) and not train and (
                self.use_pallas == "always"
                or jax.default_backend() == "tpu"
            )
            if ok:
                kw2 = dict(kw)
                kw2.pop("spike_fn")  # forward-only kernel: exact Heaviside
                kw2.pop("remat")  # scan-only knob
                return arsnn_fused_v2(
                    ev, input_conv.weights, gate_conv.weights,
                    interpret=jax.default_backend() != "tpu",
                    **kw2,
                ).astype(in_dtype)
            if self.use_pallas == "always":
                kw3 = {k: v for k, v in kw.items() if k != "remat"}
                return arsnn_scan_fused(
                    ev, input_conv, gate_conv, **kw3
                ).astype(in_dtype)
        out = arsnn_scan(ev, input_conv, gate_conv, record=record, **kw)
        if record:
            return out[0].astype(in_dtype), out[1]
        return out.astype(in_dtype)


def build_embedding(
    name: str,
    *,
    dtype=None,
    ksize: int = 7,
    depth: int = 1,
    Ts: int = 1,
    readout: str = "sum",
    spike_attach: bool = False,
    write_zero: bool = False,
    use_abs: bool = False,
    split: bool = False,
    thresh: float = 1.0,
    vreset: Optional[float] = 0.0,
    decay: float = 0.5,
    spike_fn: str = "rect",
    alpha: float = 1.0,
    use_pallas: str = "never",
    packed: str = "never",
    state_dtype: Optional[str] = None,
    remat: bool = False,
) -> nn.Module:
    """Embedding factory mirroring the reference's embedding_dict
    (reference: yolox/exp/event_yolox_base.py:166-177). The embedding's spike
    function defaults to rect regardless of the detector's, matching
    get_kwargs_spikes (:153-158)."""
    if name == "count":
        return SpikeCountEmbedding(name="embedding")
    if name == "snn":
        return LIFEmbedding(
            ksize=ksize, depth=depth, readout=readout, thresh=thresh,
            vreset=vreset, decay=decay, spike_fn=spike_fn, alpha=alpha,
            name="embedding",
        )
    if name == "rsnn":
        return RSNNEmbedding(
            ksize=ksize, depth=depth, readout=readout, use_relu=use_abs,
            thresh=thresh, vreset=vreset, spike_fn=spike_fn, alpha=alpha,
            name="embedding",
        )
    if name == "arsnn":
        return ARSNNEmbedding(
            ksize=ksize, depth=depth, Ts=Ts, readout=readout,
            spike_attach=spike_attach, write_zero=write_zero, use_abs=use_abs,
            split=split, thresh=thresh, vreset=vreset, spike_fn=spike_fn,
            alpha=alpha, dtype=dtype, use_pallas=use_pallas, packed=packed,
            state_dtype=state_dtype, remat=remat,
            name="embedding",
        )
    raise KeyError(f"unknown embedding '{name}'")
