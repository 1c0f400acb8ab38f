"""Fused PLIF activation as a Pallas TPU kernel (forward AND backward).

Why: the spiking backbone applies a ParametricLIF activation after every
conv (reference: yolox/utils/utils_snn.py:45-52 ParametricLIFNode,
step_mode='m'), and the XLA ``lax.scan`` formulation materializes the
membrane carry between the T steps — measured on a v5e at stem scale
(384x128x160x48 bf16): conv+BN+ReLU = 4.9 ms but conv+BN+PLIF = 14.4 ms,
i.e. the neuron TRIPLES every spiking conv site and makes the whole
backbone HBM-bound (77 GB/batch at B=128). This kernel reads the conv
output once, runs the T-step neuron recurrence entirely in VMEM, and
writes the spikes once — the theoretical minimum traffic — for both the
forward and the hand-derived backward pass.

Layout (the part that actually makes it fast): XLA TPU convolutions keep
NHWC activations in layout {0,3,2,1} — batch minor (lanes), channels
second-minor (sublanes). A row-major (T, R, 128) view of that tensor
costs two full relayout copies around the kernel (measured SLOWER than
the XLA scan). Instead the kernel takes the (T*B, H, W, C) conv output,
views it as (H*W*C, T*B) — a pure bitcast of the conv's physical layout
when C % 8 == 0 — and walks the T steps as 128-aligned lane slices
(requires B % 128 == 0). Zero copies in, zero copies out.

Semantics (bit-compatible with ops/lif.py:plif_step for f32 inputs; for
bf16 storage the membrane arithmetic still runs in f32 — closer to the
torch f32 reference than the XLA scan's per-op bf16 rounding, which flips
~0.1% of threshold crossings):
    a = 1 - sigmoid(w)                   # f32, computed OUTSIDE the kernel
    v_t = v_{t-1} * a + x_t              # f32
    s_t = H(v_t - thresh)                # hard spike; surrogate grad in bwd
    v_t <- v_t - thresh * s_t            # soft reset, reset grad attached

Backward (matches the scan's autodiff VJP; tests/test_plif_pallas.py):
    g_pre_t  = g_after_t + (ds_t - thresh * g_after_t) * f'(v_pre_t - th)
    dx_t     = g_pre_t
    da      += sum(g_pre_t * v_after_{t-1})
    g_after_{t-1} = g_pre_t * a
``da`` then chains through the outside (1 - sigmoid(w)) expression to dw.

Supported surrogates: atan / rect / sigmoid / tanh (ops/surrogate.py).
"""

from __future__ import annotations

import math
import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["plif_fused", "plif_fused_supported"]

_LANE = 128
_MAX_ROWS = 512  # per-block sublane rows (chip-swept: 512 > 1024 > 4096 > 128)


def _fast_math() -> bool:
    """The backward kernels are VPU-compute-bound (not byte-bound): the
    round-5 HLO profile measured 65.7 ms/step of PLIF custom-calls against
    a ~22 ms byte roofline, and the atan surrogate's divide is the single
    most expensive per-element op in the chain. ``EAS_PLIF_FAST_MATH=1``
    (default) computes it with the VPU's approximate-reciprocal
    instruction (~2^-12 relative error) — a *surrogate* gradient tolerance
    far inside the heuristic's own slack; =0 restores exact IEEE division
    (the tools/ap_drift.py f32 baseline sets it)."""
    return os.environ.get("EAS_PLIF_FAST_MATH", "1") != "0"


def _alias_dx() -> bool:
    """``EAS_PLIF_ALIAS=1``: alias the backward kernels' dx output onto the
    incoming cotangent's buffer (one less preact-sized live allocation per
    site). Sounds free; measured SLOWER at flagship B=128 (grad_full
    297.9 -> ~350 ms with aliasing on) — the donation constraint pins the
    cotangent buffer and visibly degrades XLA's scheduling around the
    custom-calls, outweighing the memory win. Default off; kept as a
    measurement switch."""
    return os.environ.get("EAS_PLIF_ALIAS", "0") == "1"


def _surrogate_deriv(kind: str, alpha: float, x, fast: bool = False):
    """f'(x) — mirrors the custom_vjp rules in ops/surrogate.py."""
    if kind == "atan":
        t = (math.pi / 2.0) * alpha * x
        if fast:
            return (alpha / 2.0) * pl.reciprocal(1.0 + t * t, approx=True)
        return (alpha / 2.0) / (1.0 + t * t)
    if kind == "rect":
        return (jnp.abs(x) < 0.5 / alpha).astype(x.dtype) * alpha
    if kind == "sigmoid":
        s = jax.nn.sigmoid(alpha * x)
        return alpha * s * (1.0 - s)
    if kind == "tanh":
        t = jnp.tanh(alpha * x)
        return 0.5 * alpha * (1.0 - t * t)
    raise KeyError(kind)


def _spike_ge(kind: str) -> bool:
    """Forward threshold comparison: >= for atan/sigmoid, > for rect/tanh
    (matching each surrogate's forward in ops/surrogate.py)."""
    return kind in ("atan", "sigmoid")


def _row_tile(R: int, min_tile: int = 16) -> int:
    """Largest divisor of R that is a multiple of ``min_tile`` and
    <= _MAX_ROWS (16 = bf16 min sublane tile, 32 for int8 outputs; both
    valid for f32), or 0 if none."""
    top = min(R, _MAX_ROWS)
    for cand in range(top - (top % min_tile), min_tile - 1, -min_tile):
        if R % cand == 0:
            return cand
    return 0


def _aff_row_tile(hw: int, C: int, min_tile: int) -> int:
    """Row tile for the AFFINE kernels: a multiple of C, of ``min_tile``,
    and dividing R = hw*C (i.e. C*k with k | hw).

    Rows of the (H*W*C, T*B) view are channel-minor with period C, so a
    block of C*k consecutive rows sees the per-channel affine pattern
    repeated k times — IDENTICALLY in every grid block. The (mean, mul,
    bias) operands therefore collapse from (R, 1) columns to ONE (rt, 1)
    tile shared by all grid steps (constant index_map), and the
    per-channel gradients accumulate in-kernel into the same (rt, 1)
    shape. The round-5 HLO profile measured the (R, 1) columns at
    4.7 GiB/s effective bandwidth (a 1-lane-in-128 layout) for
    26.9 ms/step of 'data formatting' plus their remat compress/
    uncompress copies; the (rt, 1) tile is ~2 KB and resident."""
    cap = max(min(_MAX_ROWS, hw * C) // C, 1)
    for k in range(cap, 0, -1):
        if hw % k == 0 and (C * k) % min_tile == 0:
            return C * k
    return 0


def plif_fused_supported(shape4, T: int, dtype) -> bool:
    """(T*B, H, W, C) conv output is kernel-eligible: the (H*W*C, T*B)
    view must be a bitcast of the conv's {0,3,2,1} layout (C % 8 == 0) and
    the T lane-slices must be 128-aligned (B % 128 == 0)."""
    if len(shape4) != 4 or dtype not in (jnp.bfloat16, jnp.float32):
        return False
    TB, H, W, C = shape4
    if TB % T or (TB // T) % _LANE or C % 8:
        return False
    return _row_tile(H * W * C) > 0


def _fwd_kernel(a_ref, x_ref, o_ref, *, T, B, thresh, ge):
    # Membrane arithmetic runs in f32 regardless of the storage dtype —
    # matching the torch f32 reference (and bit-matching the XLA scan for
    # f32 inputs). For bf16 inputs the XLA scan rounds v per-op to bf16 and
    # disagrees with this kernel on ~0.1% of threshold crossings; the f32
    # membrane is the branch closer to the reference, so it wins.
    a = a_ref[0]
    v = jnp.zeros((x_ref.shape[0], B), jnp.float32)
    for t in range(T):
        v = v * a + x_ref[:, t * B:(t + 1) * B].astype(jnp.float32)
        d = v - thresh
        s = (d >= 0 if ge else d > 0)
        o_ref[:, t * B:(t + 1) * B] = s.astype(o_ref.dtype)
        v = v - thresh * s.astype(jnp.float32)


def _bwd_kernel(
    a_ref, x_ref, g_ref, dx_ref, da_ref, acc_ref,
    *, T, B, thresh, kind, alpha, ge, fast=False,
):
    a32 = a_ref[0]
    # Recompute the forward in f32 — same arithmetic as _fwd_kernel, so the
    # spike set matches the forward exactly.
    v = jnp.zeros((x_ref.shape[0], B), jnp.float32)
    v_pre, v_after_prev = [], [jnp.zeros((x_ref.shape[0], B), jnp.float32)]
    for t in range(T):
        v = v * a32 + x_ref[:, t * B:(t + 1) * B].astype(jnp.float32)
        v_pre.append(v)
        d = v - thresh
        s = (d >= 0 if ge else d > 0).astype(jnp.float32)
        v = v - thresh * s
        v_after_prev.append(v)

    g_after = jnp.zeros((x_ref.shape[0], B), jnp.float32)
    da = jnp.float32(0.0)
    for t in range(T - 1, -1, -1):
        fp = _surrogate_deriv(kind, alpha, v_pre[t] - thresh, fast)
        g32 = g_ref[:, t * B:(t + 1) * B].astype(jnp.float32)
        g_pre = g_after + (g32 - thresh * g_after) * fp
        dx_ref[:, t * B:(t + 1) * B] = g_pre.astype(dx_ref.dtype)
        da = da + jnp.sum(g_pre * v_after_prev[t])
        g_after = g_pre * a32

    # Accumulate the scalar decay-grad across (sequential) grid steps.
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[0] = jnp.float32(0.0)

    acc_ref[0] += da
    da_ref[0] = acc_ref[0]


def _lanes_view(x4, T):
    """(T*B, H, W, C) -> (H*W*C, T*B): a bitcast of the conv layout."""
    TB, H, W, C = x4.shape
    return x4.transpose(1, 2, 3, 0).reshape(H * W * C, TB)


def _fwd_kernel_aff(
    a_ref, x_ref, m_ref, s_ref, b_ref, o_ref, *, T, B, thresh, ge, rdt
):
    """Forward with the train-mode BatchNorm affine fused in: per row
    (channel-minor) y = (x - mean) * mul + bias — the exact flax
    ``_normalize`` expression order — rounded to the storage dtype (the
    unfused path materializes the BN output in that dtype) before the f32
    membrane update. Removes the separate BN normalize pass (one full
    tensor read + write per spiking conv site)."""
    a = a_ref[0]
    m = m_ref[...].astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    v = jnp.zeros((x_ref.shape[0], B), jnp.float32)
    for t in range(T):
        xa = (x_ref[:, t * B:(t + 1) * B].astype(jnp.float32) - m) * s + b
        xa = xa.astype(rdt).astype(jnp.float32)
        v = v * a + xa
        d = v - thresh
        sp = (d >= 0 if ge else d > 0)
        o_ref[:, t * B:(t + 1) * B] = sp.astype(o_ref.dtype)
        v = v - thresh * sp.astype(jnp.float32)


def _bwd_kernel_aff(
    a_ref, x_ref, m_ref, s_ref, b_ref, g_ref,
    dx_ref, da_ref, dm_ref, ds_ref, db_ref, acc_ref,
    *, T, B, thresh, kind, alpha, ge, rdt, fast=False,
):
    a32 = a_ref[0]
    m = m_ref[...].astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    v = jnp.zeros((x_ref.shape[0], B), jnp.float32)
    v_pre, v_after_prev = [], [jnp.zeros((x_ref.shape[0], B), jnp.float32)]
    xms = []
    for t in range(T):
        x32 = x_ref[:, t * B:(t + 1) * B].astype(jnp.float32)
        xm = x32 - m
        xms.append(xm)
        xa = (xm * s + b).astype(rdt).astype(jnp.float32)
        v = v * a32 + xa
        v_pre.append(v)
        d = v - thresh
        sp = (d >= 0 if ge else d > 0).astype(jnp.float32)
        v = v - thresh * sp
        v_after_prev.append(v)

    g_after = jnp.zeros((x_ref.shape[0], B), jnp.float32)
    da = jnp.float32(0.0)
    ds = jnp.zeros((x_ref.shape[0], 1), jnp.float32)
    db = jnp.zeros((x_ref.shape[0], 1), jnp.float32)
    for t in range(T - 1, -1, -1):
        fp = _surrogate_deriv(kind, alpha, v_pre[t] - thresh, fast)
        g32 = g_ref[:, t * B:(t + 1) * B].astype(jnp.float32)
        g_pre = g_after + (g32 - thresh * g_after) * fp
        dx_ref[:, t * B:(t + 1) * B] = (g_pre * s).astype(dx_ref.dtype)
        ds += jnp.sum(g_pre * xms[t], axis=1, keepdims=True)
        db += jnp.sum(g_pre, axis=1, keepdims=True)
        da = da + jnp.sum(g_pre * v_after_prev[t])
        g_after = g_pre * a32

    # The affine grads live in (rt, 1) output blocks with a CONSTANT
    # index_map: the TPU grid is sequential, so the block stays resident
    # in VMEM and accumulates across grid steps (rows repeat the same
    # channel pattern in every block — see _aff_row_tile).
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[0] = jnp.float32(0.0)
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    ds_ref[...] += ds
    db_ref[...] += db
    # y=(x-m)*s+b -> dL/dm = -mul * sum(g_pre); rewritten every step, the
    # final (sequential) step leaves the fully-accumulated value.
    dm_ref[...] = -(s * db_ref[...])

    acc_ref[0] += da
    da_ref[0] = acc_ref[0]


@lru_cache(maxsize=None)
def _make_plif_fused(
    kind: str, alpha: float, thresh: float, T: int, interpret: bool,
    out_int8: bool = False,
):
    ge = _spike_ge(kind)

    def _fwd(x2, a32):
        R, TB = x2.shape
        B = TB // T
        rt = _row_tile(R, 32 if out_int8 else 16)
        out_dt = jnp.int8 if out_int8 else x2.dtype
        return pl.pallas_call(
            partial(_fwd_kernel, T=T, B=B, thresh=thresh, ge=ge),
            out_shape=jax.ShapeDtypeStruct(x2.shape, out_dt),
            grid=(R // rt,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rt, TB), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((rt, TB), lambda i: (i, 0)),
            interpret=interpret,
        )(a32, x2)

    if out_int8 == "direct":
        # Spikes are exactly 0/1, so int8 storage is bit-lossless and
        # halves the kernel's write + the consuming conv's read traffic
        # (the backbone is HBM-bound). int8 primal outputs carry no
        # tangents, so this variant is eval-only — no custom_vjp.
        return _fwd

    @jax.custom_vjp
    def fn(x2, a32):
        if out_int8:  # 'view': int8 store, bf16 convert view (train path)
            return _fwd(x2, a32).astype(x2.dtype)
        return _fwd(x2, a32)

    def fwd_rule(x2, a32):
        out = _fwd(x2, a32)
        if out_int8:  # 'view' mode: primal is the bf16 convert view
            out = out.astype(x2.dtype)
        return out, (x2, a32)

    def bwd_rule(res, g2):
        x2, a32 = res
        R, TB = x2.shape
        B = TB // T
        rt = _row_tile(R)
        dx2, da = pl.pallas_call(
            partial(
                _bwd_kernel, T=T, B=B, thresh=thresh, kind=kind,
                alpha=alpha, ge=ge, fast=_fast_math(),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(x2.shape, x2.dtype),
                jax.ShapeDtypeStruct((1,), jnp.float32),
            ),
            grid=(R // rt,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rt, TB), lambda i: (i, 0)),
                pl.BlockSpec((rt, TB), lambda i: (i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((rt, TB), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
            # dx CAN reuse the cotangent's buffer (same shape/dtype/
            # blocking) — measured slower on chip, see _alias_dx
            input_output_aliases={2: 0} if _alias_dx() else {},
            interpret=interpret,
        )(a32, x2, g2)
        return dx2, da

    fn.defvjp(fwd_rule, bwd_rule)
    return fn


@lru_cache(maxsize=None)
def _make_plif_fused_aff(
    kind: str, alpha: float, thresh: float, T: int, interpret: bool,
    out_int8: bool, rdt_name: str, rt: int,
):
    """Affine-fused variant: the train-mode BN normalize runs inside the
    kernel (see _fwd_kernel_aff). Inputs (x2, a32, m_r, s_r, b_r) with
    m/s/b as ONE (rt, 1) tile (rt = _aff_row_tile multiple of C, so the
    channel-minor row pattern is identical in every grid block); the
    tile is shared by all grid steps via a constant index_map, and the
    dm/ds/db gradients come back in the same (rt, 1) shape (accumulated
    in-kernel across the sequential grid). All five differentiable."""
    ge = _spike_ge(kind)
    rdt = jnp.dtype(rdt_name)
    vec = pl.BlockSpec((rt, 1), lambda i: (0, 0))

    def _fwd(x2, a32, m_r, s_r, b_r):
        R, TB = x2.shape
        B = TB // T
        out_dt = jnp.int8 if out_int8 else x2.dtype
        return pl.pallas_call(
            partial(_fwd_kernel_aff, T=T, B=B, thresh=thresh, ge=ge,
                    rdt=rdt),
            out_shape=jax.ShapeDtypeStruct(x2.shape, out_dt),
            grid=(R // rt,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rt, TB), lambda i: (i, 0)),
                vec, vec, vec,
            ],
            out_specs=pl.BlockSpec((rt, TB), lambda i: (i, 0)),
            interpret=interpret,
        )(a32, x2, m_r, s_r, b_r)

    @jax.custom_vjp
    def fn(x2, a32, m_r, s_r, b_r):
        out = _fwd(x2, a32, m_r, s_r, b_r)
        return out.astype(x2.dtype) if out_int8 else out

    def fwd_rule(x2, a32, m_r, s_r, b_r):
        out = _fwd(x2, a32, m_r, s_r, b_r)
        if out_int8:
            out = out.astype(x2.dtype)
        return out, (x2, a32, m_r, s_r, b_r)

    def bwd_rule(res, g2):
        x2, a32, m_r, s_r, b_r = res
        R, TB = x2.shape
        B = TB // T
        f32 = jnp.float32
        dx2, da, dm, ds, db = pl.pallas_call(
            partial(
                _bwd_kernel_aff, T=T, B=B, thresh=thresh, kind=kind,
                alpha=alpha, ge=ge, rdt=rdt, fast=_fast_math(),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(x2.shape, x2.dtype),
                jax.ShapeDtypeStruct((1,), f32),
                jax.ShapeDtypeStruct((rt, 1), f32),
                jax.ShapeDtypeStruct((rt, 1), f32),
                jax.ShapeDtypeStruct((rt, 1), f32),
            ),
            grid=(R // rt,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((rt, TB), lambda i: (i, 0)),
                vec, vec, vec,
                pl.BlockSpec((rt, TB), lambda i: (i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((rt, TB), lambda i: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                vec, vec, vec,
            ),
            scratch_shapes=[pltpu.SMEM((1,), f32)],
            input_output_aliases={5: 0} if _alias_dx() else {},
            interpret=interpret,
        )(a32, x2, m_r, s_r, b_r, g2)
        return dx2, da, dm, ds, db

    fn.defvjp(fwd_rule, bwd_rule)
    return fn


def plif_fused(
    x_tb: jnp.ndarray,
    T: int,
    w: jnp.ndarray,
    *,
    thresh: float = 1.0,
    spike_fn: str = "atan",
    alpha: float = 2.0,
    interpret: bool = False,
    out_int8=False,
    affine=None,
) -> jnp.ndarray:
    """Fused PLIF over a (T*B, H, W, C) folded sequence; returns spikes of
    the same shape. Drop-in for the reshape+``plif_scan`` path when
    ``plif_fused_supported(x_tb.shape, T, x_tb.dtype)``.

    ``affine=(mean_c, mul_c, bias_c)`` (per-channel f32): fuse the
    train-mode BatchNorm normalize ``(x - mean) * mul + bias`` into the
    kernel (exact flax expression order + storage-dtype round, so values
    match the unfused path bitwise). Gradients for all three flow out of
    the custom_vjp and chain to gamma/beta/batch-stats outside.

    ``out_int8`` — spikes are exactly 0/1, so int8 storage is bit-lossless
    and halves spike-tensor HBM traffic (the backbone is HBM-bound):
      * ``'direct'`` (or True): the kernel RETURNS int8. No tangents —
        eval-only.
      * ``'view'``: the kernel stores int8 but returns a bf16/f32 convert
        VIEW — XLA fuses the convert into each consumer (forward conv AND
        its wgrad both read the int8 buffer), while the custom_vjp
        backward still recomputes from the f32 preact: train-safe.
    """
    if out_int8 is True:
        out_int8 = "direct"
    if spike_fn == "rect":
        alpha = 1.0  # the registry pins rect to alpha=1 (surrogate.py:170)
    if out_int8 and _row_tile(
        x_tb.shape[1] * x_tb.shape[2] * x_tb.shape[3], 32
    ) == 0:
        out_int8 = False  # no 32-row tile available: keep float storage
    # Decay multiplier computed OUTSIDE the kernel in f32 (the kernel's
    # membrane arithmetic is f32 regardless of storage dtype); the
    # w-gradient chains through this expression automatically (the kernel
    # returns d/da).
    a = 1.0 - jax.nn.sigmoid(w.astype(jnp.float32))
    x2 = _lanes_view(x_tb, T)
    TB, H, W, C = x_tb.shape
    if affine is not None:
        mean_c, mul_c, bias_c = (v.astype(jnp.float32) for v in affine)
        store_view = bool(out_int8) and out_int8 != "direct"
        rt = _aff_row_tile(H * W, C, 32 if store_view else 16)
        if rt:
            # rows are channel-minor: r = (h*W + w)*C + c, so a block of
            # rt = C*k rows repeats the per-channel vector k times — the
            # SAME (rt, 1) tile serves every grid block (constant
            # index_map; see _aff_row_tile). jnp.tile is differentiable
            # (cotangent sums over the k repeats), so dmean/dmul/dbias
            # chain out of the kernel's (rt, 1) grads automatically.
            k = rt // C
            m_r = jnp.tile(mean_c, k).reshape(-1, 1)
            s_r = jnp.tile(mul_c, k).reshape(-1, 1)
            b_r = jnp.tile(bias_c, k).reshape(-1, 1)
            fn = _make_plif_fused_aff(
                spike_fn, float(alpha), float(thresh), int(T), interpret,
                store_view, jnp.dtype(x_tb.dtype).name, rt,
            )
            s2 = fn(x2, a.reshape(1), m_r, s_r, b_r)
            return s2.reshape(H, W, C, TB).transpose(3, 0, 1, 2)
        # No C-aligned row tile: apply the normalize outside (same f32
        # expression + storage-dtype round as the kernel epilogue —
        # bitwise equal) and fall through to the plain kernel.
        xa = (x_tb.astype(jnp.float32) - mean_c) * mul_c + bias_c
        x2 = _lanes_view(xa.astype(x_tb.dtype), T)
    fn = _make_plif_fused(
        spike_fn, float(alpha), float(thresh), int(T), interpret,
        out_int8,
    )
    s2 = fn(x2, a.reshape(1))
    return s2.reshape(H, W, C, TB).transpose(3, 0, 1, 2)
