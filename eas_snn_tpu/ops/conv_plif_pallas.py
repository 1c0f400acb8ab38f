"""Fused 1x1-conv + BatchNorm + PLIF as a single Pallas TPU kernel (eval).

Why: at eval the spiking backbone is HBM-bandwidth-bound (BENCHMARKS.md
roofline: 808 GB/s measured vs ~819 GB/s v5e peak). Per spiking conv
site the XLA chain is

    read spikes (int8) -> conv -> WRITE preact (bf16) ->
    READ preact (bf16) -> PLIF kernel -> write spikes (int8)

because the PLIF recurrence lives in a separate ``pallas_call`` that XLA
cannot fuse into the convolution. For a 1x1 conv the contraction is a
pure matmul, so this kernel computes conv + BN + the T-step neuron in
ONE pass: read int8 spikes, matmul on the MXU, affine + recurrence in
VMEM, write int8 spikes. The 4 bytes/element of preact traffic — the
largest single term in the backbone's byte budget — disappear.

Layout (same trick as ops/plif_pallas.py): XLA keeps NHWC conv
activations in layout {0,3,2,1} — batch minor (lanes), channels
second-minor (sublanes). The (H*W, C, T*B) view used here is a pure
bitcast of that layout (C % 8 == 0), so the kernel reads its input and
writes its output with ZERO relayout copies. Each grid step loads a
block of hw pixels and runs, per pixel, the matmul

    acc[co, tb] = sum_ci w[co, ci] * x[ci, tb]      (MXU, f32 accumulate)

with the eval-mode BatchNorm folded into the operands ahead of time
(w_fused = kernel * mul[co], bias_eff = bias - mean * mul — the standard
conv-BN fold, utils/model_surgery.py:fuse_conv_bn), then the PLIF
recurrence over the T lane-slices exactly as plif_fused's kernel does.

Forward-only by design: training keeps the autodiffable
conv -> BN-affine-fused PLIF path (ops/plif_pallas.py), whose custom_vjp
defines the gradients. Reference for the composed site semantics:
yolox/models/network_blocks.py:31-56 (BaseConv) +
yolox/utils/utils_snn.py:45-52 (ParametricLIFNode, step_mode='m').
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .plif_pallas import _spike_ge

__all__ = [
    "conv1x1_plif_fused",
    "conv1x1_plif_supported",
    "conv1x1_plif_reference",
    "conv3x3_plif_fused",
    "conv3x3_plif_supported",
    "conv3x3_plif_reference",
    "fold_conv3x3",
]

_LANE = 128


def _hw_block(HW: int) -> int:
    for cand in (16, 8, 10, 5, 4, 2, 1):
        if HW % cand == 0:
            return cand
    return 1


def _shapes(x_or_seq):
    xs = x_or_seq if isinstance(x_or_seq, (tuple, list)) else (x_or_seq,)
    return tuple(x.shape for x in xs), tuple(x.dtype for x in xs)


def conv1x1_plif_supported(shape4, T: int, c_out: int, dtype,
                           out_dtype=jnp.int8) -> bool:
    """(T*B, H, W, C_in) input(s) are kernel-eligible: the (H*W, C, T*B)
    views must be bitcasts of the conv layout (each C % 8 == 0) and the T
    lane-slices 128-aligned (B % 128 == 0). ``shape4``/``dtype`` may be a
    single input's shape/dtype or matching tuples of them (a virtual
    channel-concat: the kernel sums one MXU dot per input and the concat
    is never materialized). ``out_dtype`` must match the fused call's —
    the VMEM estimate scales its output-block term by its itemsize."""
    shapes = (shape4,) if len(shape4) and not isinstance(
        shape4[0], (tuple, list)
    ) else tuple(shape4)
    dtypes = (dtype,) * len(shapes) if not isinstance(
        dtype, (tuple, list)
    ) else tuple(dtype)
    ok_dts = (jnp.dtype(jnp.int8), jnp.dtype(jnp.bfloat16),
              jnp.dtype(jnp.float32))
    if any(jnp.dtype(dt) not in ok_dts for dt in dtypes):
        return False
    if any(len(s) != 4 for s in shapes):
        return False
    TB, H, W, _ = shapes[0]
    if any(s[:3] != (TB, H, W) for s in shapes):
        return False
    if TB % T or (TB // T) % _LANE or c_out % 8:
        return False
    if any(s[3] % 8 for s in shapes):
        return False
    blk = _hw_block(H * W)
    C = sum(s[3] for s in shapes)
    isz = max(jnp.dtype(dt).itemsize for dt in dtypes)
    osz = jnp.dtype(out_dtype).itemsize
    est = (
        2 * blk * C * TB * isz                        # x blocks
        + 2 * blk * c_out * TB * osz                  # out blocks
        + 2 * c_out * TB * 4 + c_out * (TB // T) * 4  # acc + v values
        + c_out * C * 2 + c_out * 4
    )
    return est < 80 * 1024 * 1024


def _kernel(a_ref, b_ref, *refs, T, B, thresh, ge, n):
    ws = refs[:n]
    xs = refs[n:2 * n]
    o_ref = refs[2 * n]
    a = a_ref[0]
    b = b_ref[...].astype(jnp.float32)
    Cout = o_ref.shape[1]

    def body(i, _):
        acc = jnp.zeros((Cout, o_ref.shape[-1]), jnp.float32) + b
        for j in range(n):
            wj = ws[j][...]
            acc = acc + jax.lax.dot_general(
                wj, xs[j][i].astype(wj.dtype),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                          # (Cout, TB), f32
        v = jnp.zeros((Cout, B), jnp.float32)
        for t in range(T):
            v = v * a + acc[:, t * B:(t + 1) * B]
            d = v - thresh
            sp = (d >= 0 if ge else d > 0)
            o_ref[i, :, t * B:(t + 1) * B] = sp.astype(o_ref.dtype)
            v = v - thresh * sp.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, xs[0].shape[0], body, 0)


@lru_cache(maxsize=None)
def _make(kind: str, thresh: float, T: int, HW: int, cins: tuple,
          Cout: int, interpret: bool, in_dts: tuple, out_dt: str):
    ge = _spike_ge(kind)
    blk = _hw_block(HW)
    n = len(cins)

    def fn(a32, bias, *wx):
        TB = wx[n].shape[-1]
        B = TB // T
        return pl.pallas_call(
            partial(_kernel, T=T, B=B, thresh=thresh, ge=ge, n=n),
            out_shape=jax.ShapeDtypeStruct(
                (HW, Cout, TB), jnp.dtype(out_dt)
            ),
            grid=(HW // blk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((Cout, 1), lambda i: (0, 0)),
            ] + [
                pl.BlockSpec((Cout, c), lambda i: (0, 0)) for c in cins
            ] + [
                pl.BlockSpec((blk, c, TB), lambda i: (i, 0, 0))
                for c in cins
            ],
            out_specs=pl.BlockSpec(
                (blk, Cout, TB), lambda i: (i, 0, 0)
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(a32, bias, *wx)

    return fn


def conv1x1_plif_fused(
    x_tb: jnp.ndarray,
    w_oc: jnp.ndarray,
    bias: jnp.ndarray,
    T: int,
    w_plif: jnp.ndarray,
    *,
    thresh: float = 1.0,
    spike_fn: str = "atan",
    out_dtype=jnp.int8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused eval-time 1x1 conv + folded BN + PLIF.

    Args:
      x_tb: (T*B, H, W, C_in) input spikes/activations (int8/bf16/f32).
      w_oc: (C_out, C_in) BN-folded conv weights (kernel[0,0].T * mul[:,None]).
      bias: (C_out,) BN-folded bias (beta - mean * mul).
      T: time steps folded in the batch axis.
      w_plif: PLIF decay logit (scalar); a = 1 - sigmoid(w) outside, f32.
      out_dtype: jnp.int8 for spike storage (bit-lossless — spikes are 0/1).

    ``x_tb`` may also be a tuple of (T*B, H, W, C_j) tensors — a virtual
    channel-concat (``w_oc`` has C_in = sum C_j, ordered like the concat):
    the kernel sums one MXU dot per input, so the concatenated tensor is
    never materialized in HBM (CSP conv3 / SPP conv2 sites,
    reference network_blocks.py:146,187).

    Returns (T*B, H, W, C_out) spikes in ``out_dtype``.
    """
    xs = x_tb if isinstance(x_tb, (tuple, list)) else (x_tb,)
    TB, H, W = xs[0].shape[:3]
    cins = tuple(x.shape[3] for x in xs)
    Cout = w_oc.shape[0]
    a = (1.0 - jax.nn.sigmoid(w_plif.astype(jnp.float32))).reshape(1)
    x3s = [x.transpose(1, 2, 3, 0).reshape(H * W, c, TB)
           for x, c in zip(xs, cins)]
    fn = _make(
        spike_fn, float(thresh), int(T), H * W, cins, Cout, interpret,
        tuple(jnp.dtype(x.dtype).name for x in xs),
        jnp.dtype(out_dtype).name,
    )
    # Multiplies in bf16 (matching the XLA conv's default TPU precision),
    # accumulate in f32.
    offs = np.cumsum((0,) + cins)
    w16 = w_oc.astype(jnp.bfloat16)
    wjs = [w16[:, offs[j]:offs[j + 1]] for j in range(len(cins))]
    s3 = fn(a, bias.reshape(-1, 1).astype(jnp.float32), *wjs, *x3s)
    return s3.reshape(H, W, Cout, TB).transpose(3, 0, 1, 2)


# ---------------------------------------------------------------------------
# 3x3 stride-1 variant (Bottleneck conv2 sites, network_blocks.py:81-104)
# ---------------------------------------------------------------------------
#
# Same layout and epilogue as the 1x1 kernel; the conv becomes, per output
# pixel, three MXU dots (one per dy) with dx and C_in folded into the
# contraction:  acc += w[dy] @ pad[h+dy, w:w+3].reshape(3*Cin, TB).
# The H halo comes from two extra single-row inputs whose index maps pick
# the rows just outside the center block (clamped at the image border and
# zeroed in-kernel); the W halo is a zero column on each side of the
# padded slab assembled in VMEM scratch. Input re-read is (h_blk+2)/h_blk
# of one int8 pass — far below the 4 bytes/element of bf16 preact traffic
# this kernel removes.


def _h_block(H: int) -> int:
    for cand in (8, 4, 2, 1):
        if H % cand == 0:
            return cand
    return 1


def conv3x3_plif_supported(shape4, T: int, c_out: int, dtype,
                           out_dtype=jnp.int8) -> bool:
    if len(shape4) != 4:
        return False
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.int8), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)
    ):
        return False
    TB, H, W, C = shape4
    if TB % T or (TB // T) % _LANE or C % 8 or c_out % 8:
        return False
    hb = _h_block(H)
    isz = jnp.dtype(dtype).itemsize
    osz = jnp.dtype(out_dtype).itemsize
    est = (
        (hb + 2) * (W + 2) * C * TB * isz          # padded slab scratch
        + 2 * hb * W * C * TB * isz                # center blocks
        + 4 * W * C * TB * isz                     # slim halo blocks
        + 2 * hb * W * c_out * TB * osz            # out blocks
        + 2 * c_out * TB * 4                       # acc/v values
        + 3 * c_out * 3 * C * 2 + c_out * 4
    )
    return est < 80 * 1024 * 1024


def fold_conv3x3(kernel_hwio: jnp.ndarray, mul: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, Cin, Cout) HWIO kernel * per-Cout BN mul -> (3, Cout, 3*Cin)
    with the last axis ordered (dx, ci) to match the kernel's
    ``pad[h+dy, w:w+3].reshape(3*Cin, TB)`` operand."""
    k = kernel_hwio.astype(jnp.float32) * mul[None, None, None, :]
    # (dy, dx, ci, co) -> (dy, co, dx, ci) -> (3, Cout, 3*Cin)
    k = k.transpose(0, 3, 1, 2)
    return k.reshape(3, k.shape[1], -1)


def _kernel3(a_ref, w_ref, b_ref, xc_ref, xp_ref, xn_ref, o_ref, pad_ref,
             *, T, B, thresh, ge, h_blk, W, nb):
    i = pl.program_id(0)
    a = a_ref[0]
    b = b_ref[...].astype(jnp.float32)
    zrow = jnp.zeros(pad_ref.shape[1:], pad_ref.dtype)  # (W+2, Cin, TB)

    # assemble the zero-bordered slab: rows 1..h_blk are the center block,
    # rows 0 / h_blk+1 the halo rows (zeroed at the image border)
    zcol = jnp.zeros(
        (pad_ref.shape[0],) + pad_ref.shape[2:], pad_ref.dtype
    )
    pad_ref[:, 0] = zcol
    pad_ref[:, W + 1] = zcol
    pad_ref[0, 1:W + 1] = xp_ref[0]
    pad_ref[h_blk + 1, 1:W + 1] = xn_ref[0]
    for h in range(h_blk):
        pad_ref[h + 1, 1:W + 1] = xc_ref[h]

    @pl.when(i == 0)
    def _top():
        pad_ref[0] = zrow

    @pl.when(i == nb - 1)
    def _bot():
        pad_ref[h_blk + 1] = zrow

    Cout = o_ref.shape[2]
    f32 = jnp.float32

    for h in range(h_blk):

        def wbody(wi, _, h=h):
            acc = jnp.zeros((Cout, xc_ref.shape[-1]), f32) + b
            for dy in range(3):
                xs = pad_ref[h + dy, pl.dslice(wi, 3)]     # (3, Cin, TB)
                xs = xs.reshape(-1, xs.shape[-1])          # (3*Cin, TB)
                acc = acc + jax.lax.dot_general(
                    w_ref[dy], xs.astype(w_ref.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
            v = jnp.zeros((Cout, B), f32)
            for t in range(T):
                v = v * a + acc[:, t * B:(t + 1) * B]
                d = v - thresh
                sp = (d >= 0 if ge else d > 0)
                o_ref[h, pl.dslice(wi, 1), :, t * B:(t + 1) * B] = (
                    sp.astype(o_ref.dtype)[None]
                )
                v = v - thresh * sp.astype(f32)
            return 0

        jax.lax.fori_loop(0, W, wbody, 0)


@lru_cache(maxsize=None)
def _make3(kind: str, thresh: float, T: int, H: int, W: int, Cin: int,
           Cout: int, interpret: bool, in_dt: str, out_dt: str):
    ge = _spike_ge(kind)
    hb = _h_block(H)
    nb = H // hb

    def fn(x4v, a32, w3, bias):
        TB = x4v.shape[-1]
        B = TB // T
        slim = lambda f: pl.BlockSpec(  # noqa: E731
            (1, W, Cin, TB), lambda i: (f(i), 0, 0, 0)
        )
        return pl.pallas_call(
            partial(_kernel3, T=T, B=B, thresh=thresh, ge=ge, h_blk=hb,
                    W=W, nb=nb),
            out_shape=jax.ShapeDtypeStruct(
                (H, W, Cout, TB), jnp.dtype(out_dt)
            ),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((3, Cout, 3 * Cin), lambda i: (0, 0, 0)),
                pl.BlockSpec((Cout, 1), lambda i: (0, 0)),
                pl.BlockSpec((hb, W, Cin, TB), lambda i: (i, 0, 0, 0)),
                slim(lambda i: jnp.maximum(i * hb - 1, 0)),
                slim(lambda i: jnp.minimum((i + 1) * hb, H - 1)),
            ],
            out_specs=pl.BlockSpec(
                (hb, W, Cout, TB), lambda i: (i, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hb + 2, W + 2, Cin, TB), jnp.dtype(in_dt)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(a32, w3, bias, x4v, x4v, x4v)

    return fn


def conv3x3_plif_fused(
    x_tb: jnp.ndarray,
    w3: jnp.ndarray,
    bias: jnp.ndarray,
    T: int,
    w_plif: jnp.ndarray,
    *,
    thresh: float = 1.0,
    spike_fn: str = "atan",
    out_dtype=jnp.int8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused eval-time 3x3/stride-1 conv + folded BN + PLIF.

    Args:
      x_tb: (T*B, H, W, C_in) input spikes/activations.
      w3: (3, C_out, 3*C_in) BN-folded weights from :func:`fold_conv3x3`.
      bias: (C_out,) BN-folded bias.

    Returns (T*B, H, W, C_out) spikes in ``out_dtype``.
    """
    TB, H, W, Cin = x_tb.shape
    Cout = w3.shape[1]
    a = (1.0 - jax.nn.sigmoid(w_plif.astype(jnp.float32))).reshape(1)
    x4v = x_tb.transpose(1, 2, 3, 0)  # (H, W, Cin, TB) — layout bitcast
    fn = _make3(
        spike_fn, float(thresh), int(T), H, W, Cin, Cout, interpret,
        jnp.dtype(x_tb.dtype).name, jnp.dtype(out_dtype).name,
    )
    s4 = fn(x4v, a, w3.astype(jnp.bfloat16),
            bias.reshape(-1, 1).astype(jnp.float32))
    return s4.transpose(3, 0, 1, 2)


def conv3x3_plif_reference(
    x_tb, w3, bias, T, w_plif, *, thresh=1.0, spike_fn="atan",
    out_dtype=jnp.int8,
):
    """Pure-JAX mirror (bf16 multiplies, f32 accumulate, same per-step
    order) — the PLIF fallback off-TPU and the test oracle."""
    ge = _spike_ge(spike_fn)
    TB, H, W, Cin = x_tb.shape
    Cout = w3.shape[1]
    B = TB // T
    # (3, Cout, 3*Cin) -> HWIO
    k = w3.reshape(3, Cout, 3, Cin).transpose(0, 2, 3, 1)
    acc = jax.lax.conv_general_dilated(
        x_tb.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias.astype(jnp.float32)
    a = 1.0 - jax.nn.sigmoid(w_plif.astype(jnp.float32))
    xs = acc.reshape((T, B) + acc.shape[1:])
    v = jnp.zeros_like(xs[0])
    outs = []
    for t in range(T):
        v = v * a + xs[t]
        d = v - thresh
        sp = (d >= 0 if ge else d > 0)
        outs.append(sp.astype(out_dtype))
        v = v - thresh * sp.astype(jnp.float32)
    return jnp.stack(outs).reshape((TB,) + acc.shape[1:])


# ---------------------------------------------------------------------------
# 3x3 stride-2 variant (stage downsample convs, darknet.py dark2..dark5)
# ---------------------------------------------------------------------------
#
# Output pixel (h, w) taps input rows 2h+dy-1 and cols 2w+dx-1. A grid
# block of ho_blk output rows needs input rows [2*ho0-1, 2*ho0+2*ho_blk-1]
# — the aligned center block plus ONE slim row above it. Everything else
# (slab assembly, per-pixel dots, in-VMEM recurrence) matches the
# stride-1 kernel.


def _s2_vmem_est(hb: int, W: int, C: int, c_out: int, TB: int,
                 isz: int, osz: int) -> int:
    Wo = W // 2
    return (
        (2 * hb + 1) * (W + 2) * C * TB * isz      # padded slab scratch
        + 2 * 2 * hb * W * C * TB * isz            # center blocks
        + 2 * W * C * TB * isz                     # slim halo block
        + 2 * hb * Wo * c_out * TB * osz           # out blocks
        + 2 * c_out * TB * 4
        + 3 * c_out * 3 * C * 2 + c_out * 4
    )


def _ho_block(Ho: int, W: int, C: int, c_out: int, TB: int,
              isz: int, osz: int) -> int:
    """Largest output-row block whose VMEM working set fits the budget.

    hb=4 overflows the 80 MB gate at EVERY flagship downsample geometry
    (dark2..dark5 at B=128 are all ~100 MB there) while hb=2 fits them
    all (~56 MB) — so the block size must adapt to the estimate, not
    just to divisibility, or the stride-2 kernel never engages.
    """
    for cand in (4, 2, 1):
        if Ho % cand == 0 and (
            _s2_vmem_est(cand, W, C, c_out, TB, isz, osz) < 80 * 1024 * 1024
        ):
            return cand
    return 0


def conv3x3s2_plif_supported(shape4, T: int, c_out: int, dtype,
                             out_dtype=jnp.int8) -> bool:
    if len(shape4) != 4:
        return False
    if jnp.dtype(dtype) not in (
        jnp.dtype(jnp.int8), jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)
    ):
        return False
    TB, H, W, C = shape4
    if H % 2 or W % 2:
        return False
    if TB % T or (TB // T) % _LANE or C % 8 or c_out % 8:
        return False
    isz = jnp.dtype(dtype).itemsize
    osz = jnp.dtype(out_dtype).itemsize
    return _ho_block(H // 2, W, C, c_out, TB, isz, osz) >= 1


def _kernel3s2(a_ref, w_ref, b_ref, xc_ref, xp_ref, o_ref, pad_ref,
               *, T, B, thresh, ge, ho_blk, W, Wo):
    i = pl.program_id(0)
    a = a_ref[0]
    b = b_ref[...].astype(jnp.float32)

    # slab rows: 0 = input row 2*ho0-1 (slim, zero at the top border),
    # 1..2*ho_blk = the aligned center block. Columns shifted by +1 with
    # zero borders at 0 and W+1 (the right border col W+1 covers dx=+1 at
    # w = Wo-1, input col 2*(Wo-1)+1+1 = W -> slab W+1).
    zcol = jnp.zeros(
        (pad_ref.shape[0],) + pad_ref.shape[2:], pad_ref.dtype
    )
    pad_ref[:, 0] = zcol
    pad_ref[:, W + 1] = zcol
    pad_ref[0, 1:W + 1] = xp_ref[0]
    for h in range(2 * ho_blk):
        pad_ref[h + 1, 1:W + 1] = xc_ref[h]

    @pl.when(i == 0)
    def _top():
        pad_ref[0] = jnp.zeros(pad_ref.shape[1:], pad_ref.dtype)

    Cout = o_ref.shape[2]
    f32 = jnp.float32

    for h in range(ho_blk):

        def wbody(wi, _, h=h):
            acc = jnp.zeros((Cout, xc_ref.shape[-1]), f32) + b
            for dy in range(3):
                # input row 2*(ho0+h)+dy-1 -> slab row 2h+dy; input col
                # 2w+dx-1 -> slab col 2w+dx
                xs = pad_ref[2 * h + dy, pl.dslice(2 * wi, 3)]
                xs = xs.reshape(-1, xs.shape[-1])
                acc = acc + jax.lax.dot_general(
                    w_ref[dy], xs.astype(w_ref.dtype),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
            v = jnp.zeros((Cout, B), f32)
            for t in range(T):
                v = v * a + acc[:, t * B:(t + 1) * B]
                d = v - thresh
                sp = (d >= 0 if ge else d > 0)
                o_ref[h, pl.dslice(wi, 1), :, t * B:(t + 1) * B] = (
                    sp.astype(o_ref.dtype)[None]
                )
                v = v - thresh * sp.astype(f32)
            return 0

        jax.lax.fori_loop(0, Wo, wbody, 0)


@lru_cache(maxsize=None)
def _make3s2(kind: str, thresh: float, T: int, H: int, W: int, Cin: int,
             Cout: int, interpret: bool, in_dt: str, out_dt: str, TB: int):
    ge = _spike_ge(kind)
    Ho, Wo = H // 2, W // 2
    hb = _ho_block(Ho, W, Cin, Cout, TB, jnp.dtype(in_dt).itemsize,
                   jnp.dtype(out_dt).itemsize)
    if hb < 1:
        raise ValueError("conv3x3s2_plif_fused: geometry exceeds the VMEM "
                         "budget (call conv3x3s2_plif_supported first)")
    nb = Ho // hb

    def fn(x4v, a32, w3, bias):
        TB = x4v.shape[-1]
        B = TB // T
        return pl.pallas_call(
            partial(_kernel3s2, T=T, B=B, thresh=thresh, ge=ge, ho_blk=hb,
                    W=W, Wo=Wo),
            out_shape=jax.ShapeDtypeStruct(
                (Ho, Wo, Cout, TB), jnp.dtype(out_dt)
            ),
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((3, Cout, 3 * Cin), lambda i: (0, 0, 0)),
                pl.BlockSpec((Cout, 1), lambda i: (0, 0)),
                pl.BlockSpec((2 * hb, W, Cin, TB), lambda i: (i, 0, 0, 0)),
                pl.BlockSpec(
                    (1, W, Cin, TB),
                    lambda i: (jnp.maximum(2 * hb * i - 1, 0), 0, 0, 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (hb, Wo, Cout, TB), lambda i: (i, 0, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2 * hb + 1, W + 2, Cin, TB), jnp.dtype(in_dt)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(a32, w3, bias, x4v, x4v)

    return fn


def conv3x3s2_plif_fused(
    x_tb: jnp.ndarray,
    w3: jnp.ndarray,
    bias: jnp.ndarray,
    T: int,
    w_plif: jnp.ndarray,
    *,
    thresh: float = 1.0,
    spike_fn: str = "atan",
    out_dtype=jnp.int8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused eval-time 3x3/stride-2 conv + folded BN + PLIF.
    Weights from :func:`fold_conv3x3`. Returns (T*B, H/2, W/2, C_out)."""
    TB, H, W, Cin = x_tb.shape
    a = (1.0 - jax.nn.sigmoid(w_plif.astype(jnp.float32))).reshape(1)
    x4v = x_tb.transpose(1, 2, 3, 0)
    fn = _make3s2(
        spike_fn, float(thresh), int(T), H, W, Cin, w3.shape[1], interpret,
        jnp.dtype(x_tb.dtype).name, jnp.dtype(out_dtype).name, int(TB),
    )
    s4 = fn(x4v, a, w3.astype(jnp.bfloat16),
            bias.reshape(-1, 1).astype(jnp.float32))
    return s4.transpose(3, 0, 1, 2)


def conv3x3s2_plif_reference(
    x_tb, w3, bias, T, w_plif, *, thresh=1.0, spike_fn="atan",
    out_dtype=jnp.int8,
):
    """Pure-JAX mirror of the stride-2 kernel (SAME padding, torch/flax
    stride-2 window alignment: output (h, w) taps input 2h+dy-1)."""
    ge = _spike_ge(spike_fn)
    TB = x_tb.shape[0]
    Cout = w3.shape[1]
    B = TB // T
    k = w3.reshape(3, Cout, 3, -1).transpose(0, 2, 3, 1)
    acc = jax.lax.conv_general_dilated(
        x_tb.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (2, 2),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias.astype(jnp.float32)
    a = 1.0 - jax.nn.sigmoid(w_plif.astype(jnp.float32))
    xs = acc.reshape((T, B) + acc.shape[1:])
    v = jnp.zeros_like(xs[0])
    outs = []
    for t in range(T):
        v = v * a + xs[t]
        d = v - thresh
        sp = (d >= 0 if ge else d > 0)
        outs.append(sp.astype(out_dtype))
        v = v - thresh * sp.astype(jnp.float32)
    return jnp.stack(outs).reshape((TB,) + acc.shape[1:])


def conv1x1_plif_reference(
    x_tb, w_oc, bias, T, w_plif, *, thresh=1.0, spike_fn="atan",
    out_dtype=jnp.int8,
):
    """Pure-JAX mirror of the fused kernel (same dtypes/order per step,
    incl. one dot per input of a virtual concat) — the PLIF fallback on
    non-TPU backends and the equivalence oracle in
    tests/test_conv_plif_pallas.py."""
    ge = _spike_ge(spike_fn)
    xs = x_tb if isinstance(x_tb, (tuple, list)) else (x_tb,)
    TB = xs[0].shape[0]
    B = TB // T
    w16 = w_oc.astype(jnp.bfloat16)
    acc = bias.astype(jnp.float32)
    off = 0
    for x in xs:
        c = x.shape[3]
        acc = acc + jax.lax.dot_general(
            x.astype(jnp.bfloat16), w16[:, off:off + c],
            (((3,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (TB, H, W, Cout)
        off += c
    a = 1.0 - jax.nn.sigmoid(w_plif.astype(jnp.float32))
    xs = acc.reshape((T, B) + acc.shape[1:])
    v = jnp.zeros_like(xs[0])
    outs = []
    for t in range(T):
        v = v * a + xs[t]
        d = v - thresh
        sp = (d >= 0 if ge else d > 0)
        outs.append(sp.astype(out_dtype))
        v = v - thresh * sp.astype(jnp.float32)
    return jnp.stack(outs).reshape((TB,) + acc.shape[1:])
