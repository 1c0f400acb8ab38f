"""Pallas-fused ARSNN adaptive sampling (the paper's hot loop).

The scientific hot loop (reference: yolox/models/embedding.py:170-201;
SURVEY.md §3.5) interleaves a recurrent gate conv with a long elementwise
chain: gated LIF membrane update, surrogate threshold, soft/hard reset,
running no-reset integral, segment bookkeeping, and the masked one-hot
write into the ``Ts`` aggregation slots (incl. Spike-Aware ``spike_attach``
and the RPD ``write_zero`` path at the end).

Two generations live here:

* **v1** (``arsnn_scan_fused``): one Pallas kernel per scan step fusing the
  elementwise chain over (R, 128) tiles; convs stay in XLA. Slower than
  the XLA scan (per-step HBM round-trips of all state) — kept for its
  simplicity and as a second equivalence reference.
* **v2** (``arsnn_fused_v2``): the WHOLE scan in one pallas_call, grid
  (N, Tm) with time innermost (TPU grid iterations are sequential and
  scratch persists across them). Per batch element, every state tensor and
  the aggregation stay resident in VMEM for all Tm steps, and BOTH
  depth-stacked convs are computed inside the kernel as roll-based
  shift-FMA stencils accumulated in-place in VMEM scratch.
  This sidesteps XLA's channel-lane padding tax on C=2 NHWC convs
  entirely, and computes convs in TRUE f32 — the XLA path's convs use the
  TPU default matmul precision (bf16 multiplies), so v2 is the more
  faithful branch: on-chip it matches the XLA scan bit-tight only when
  XLA runs at ``jax_default_matmul_precision=highest`` (chaotic threshold
  dynamics amplify any lower-precision difference into visibly different
  spike trains; both are "correct", v2 is closer to the f32 reference).
  Forward-only: the XLA scan's VJP defines training gradients.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .surrogate import SpikeFn

__all__ = ["arsnn_scan_fused", "arsnn_fused_v2", "fused_step_reference",
           "v2_supported"]

_LANES = 128
_BLOCK_ROWS = 512  # (512, 128) f32 tiles = 256 KiB per operand


def _pad_rows(n: int) -> int:
    r = -(-n // _LANES)
    return -(-r // _BLOCK_ROWS) * _BLOCK_ROWS


def _to_tiles(x: jnp.ndarray, rows: int, dtype=None) -> jnp.ndarray:
    flat = x.reshape(-1)
    if dtype is not None:
        flat = flat.astype(dtype)
    pad = rows * _LANES - flat.shape[0]
    flat = jnp.pad(flat, (0, pad))
    return flat.reshape(rows, _LANES)


def _step_kernel(
    # scalar prefetch
    t_ref,
    # inputs
    gin_ref, grec_ref, cin_ref, crec_ref,
    vmem_ref, vavg_ref, seg_ref, tlast_ref, agg_ref,
    # outputs
    vmem_out, vavg_out, spike_out, seg_out, tlast_out, agg_out,
    *,
    Ts: int,
    thresh: float,
    vreset: Optional[float],
    readout: str,
    spike_attach: bool,
):
    t = t_ref[0]
    gate = jax.nn.sigmoid(gin_ref[:] + grec_ref[:])
    current = cin_ref[:] + crec_ref[:]
    v = gate * vmem_ref[:] + current
    spike = (v - thresh > 0.0).astype(v.dtype)
    v_noreset = v
    if vreset is None:
        v_after = v - thresh * spike
    else:
        v_after = v * (1.0 - spike) + vreset * spike
    vavg = vavg_ref[:] + v_noreset

    seg = seg_ref[:]
    spiked = spike > 0.5
    valid = spiked & (seg < Ts)

    if readout == "sum":
        w = vavg
    elif readout == "last":
        w = v_after
    elif readout == "avg":
        dt = jnp.maximum(t - tlast_ref[:], 1).astype(v.dtype)
        w = vavg / dt
    else:
        raise NotImplementedError(readout)
    if spike_attach:
        w = w * spike  # forward value unchanged for 0/1 spikes on valid set
    write = jnp.where(valid, w, 0.0)
    for s in range(Ts):
        agg_out[s] = agg_ref[s] + jnp.where(seg == s, write, 0.0)

    vmem_out[:] = v_after
    spike_out[:] = spike
    seg_out[:] = seg + valid.astype(seg.dtype)
    tlast_out[:] = jnp.where(valid, t, tlast_ref[:])
    vavg_out[:] = jnp.where(spiked, 0.0, vavg)


def _fused_step(
    t, g_in, g_rec, c_in, c_rec, vmem, vavg, seg, tlast, agg,
    *, Ts, thresh, vreset, readout, spike_attach, interpret=False,
):
    """One fused elementwise ARSNN step over (R, 128) tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = vmem.shape[0]
    grid = (R // _BLOCK_ROWS,)
    # index maps receive (grid_idx, *scalar_prefetch_refs)
    fblock = pl.BlockSpec(
        (_BLOCK_ROWS, _LANES), lambda i, _t: (i, 0), memory_space=pltpu.VMEM
    )
    ablock = pl.BlockSpec(
        (Ts, _BLOCK_ROWS, _LANES), lambda i, _t: (0, i, 0),
        memory_space=pltpu.VMEM,
    )
    f32 = jax.ShapeDtypeStruct((R, _LANES), vmem.dtype)
    i32 = jax.ShapeDtypeStruct((R, _LANES), jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[fblock] * 6 + [fblock, fblock, ablock],
        out_specs=(fblock, fblock, fblock, fblock, fblock, ablock),
    )
    kernel = functools.partial(
        _step_kernel, Ts=Ts, thresh=thresh, vreset=vreset,
        readout=readout, spike_attach=spike_attach,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            f32, f32, f32, i32, i32,
            jax.ShapeDtypeStruct((Ts, R, _LANES), vmem.dtype),
        ),
        # alias the big carries in place: vmem, vavg, seg, tlast, agg
        # (input index offset by 1 for the scalar-prefetch arg)
        input_output_aliases={5: 0, 6: 1, 7: 3, 8: 4, 9: 5},
        interpret=interpret,
    )(jnp.asarray([t], jnp.int32), g_in, g_rec, c_in, c_rec,
      vmem, vavg, seg, tlast, agg)


def fused_step_reference(
    t, g_in, g_rec, c_in, c_rec, vmem, vavg, seg, tlast, agg,
    *, Ts, thresh, vreset, readout, spike_attach, spike_fn: SpikeFn,
):
    """Pure-JAX mirror of the fused step (ops/arsnn.py semantics) — used as
    the custom_vjp backward and in equivalence tests."""
    gate = jax.nn.sigmoid(g_in + g_rec)
    current = c_in + c_rec
    v = gate * vmem + current
    spike = spike_fn(v - thresh)
    v_noreset = v
    v_after = (
        v - thresh * spike if vreset is None
        else v * (1.0 - spike) + vreset * spike
    )
    vavg_new = vavg + v_noreset
    spiked = jax.lax.stop_gradient(spike) > 0.5
    valid = spiked & (seg < Ts)
    if readout == "sum":
        w = vavg_new
    elif readout == "last":
        w = v_after
    elif readout == "avg":
        dt = jnp.maximum(t - tlast, 1).astype(v.dtype)
        w = vavg_new / dt
    else:
        raise NotImplementedError(readout)
    if spike_attach:
        w = w * spike
    write = jnp.where(valid, w, 0.0)
    iota = jnp.arange(Ts, dtype=seg.dtype).reshape((Ts,) + (1,) * seg.ndim)
    agg_new = agg + (seg[None] == iota) * write[None]
    return (
        v_after,
        jnp.where(spiked, 0.0, vavg_new),
        spike,
        seg + valid.astype(seg.dtype),
        jnp.where(valid, t, tlast),
        agg_new,
    )


def arsnn_scan_fused(
    events: jnp.ndarray,
    input_conv_fn: Callable[[jnp.ndarray], jnp.ndarray],
    gate_conv_fn: Callable[[jnp.ndarray], jnp.ndarray],
    *,
    Ts: int,
    thresh: float,
    vreset: Optional[float],
    spike_fn: SpikeFn,
    readout: str = "sum",
    spike_attach: bool = False,
    write_zero: bool = False,
    use_abs: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in (forward) replacement for ops/arsnn.py:arsnn_scan using the
    fused Pallas step. Returns the (Ts, N, H, W, C) aggregation.

    Note: intended for the inference path; the training path keeps the XLA
    scan whose VJP defines the gradients (identical forward values — tests
    assert elementwise equality).
    """
    Tm = events.shape[0]
    inpt_all = input_conv_fn(events.reshape((-1,) + events.shape[2:]))
    inpt_all = inpt_all.reshape(
        (Tm,) + events.shape[1:-1] + (inpt_all.shape[-1],)
    )
    g_in_all, c_in_all = jnp.split(inpt_all, 2, axis=-1)

    state_shape = g_in_all.shape[1:]
    M = 1
    for d in state_shape:
        M *= d
    R = _pad_rows(M)
    f32 = events.dtype

    vmem = jnp.zeros((R, _LANES), f32)
    vavg = jnp.zeros((R, _LANES), f32)
    seg = jnp.zeros((R, _LANES), jnp.int32)
    tlast = jnp.full((R, _LANES), -1, jnp.int32)
    agg = jnp.zeros((Ts, R, _LANES), f32)
    spike_state = jnp.zeros(state_shape, f32)  # feeds the gate conv

    for t in range(Tm):
        rec = gate_conv_fn(spike_state)
        g_rec, c_rec = jnp.split(rec, 2, axis=-1)
        vmem, vavg, spike_t, seg, tlast, agg = _fused_step(
            t,
            _to_tiles(g_in_all[t], R), _to_tiles(g_rec, R),
            _to_tiles(c_in_all[t], R), _to_tiles(c_rec, R),
            vmem, vavg, seg, tlast, agg,
            Ts=Ts, thresh=thresh, vreset=vreset, readout=readout,
            spike_attach=spike_attach, interpret=interpret,
        )
        spike_state = spike_t.reshape(-1)[:M].reshape(state_shape)

    # residual write for never-finished elements (embedding.py:203-217)
    last_spiked = _to_tiles(spike_state, R) > 0.5
    valid = (~last_spiked) & (seg < Ts)
    if readout == "sum":
        w = vavg
    elif readout == "last":
        w = vmem
    elif readout == "avg":
        denom = jnp.maximum(Tm - 1 - tlast, 1).astype(f32)
        w = vavg / denom
    if write_zero:
        w = w * 0.0
    write = jnp.where(valid, w, 0.0)
    iota = jnp.arange(Ts, dtype=seg.dtype).reshape(Ts, 1, 1)
    agg = agg + (seg[None] == iota) * write[None]

    agg = agg.reshape(Ts, R * _LANES)[:, :M].reshape((Ts,) + state_shape)
    if use_abs:
        agg = jax.nn.relu(agg)
    return agg


# ---------------------------------------------------------------------------
# v2: whole-scan-resident kernel
# ---------------------------------------------------------------------------
#
# Why v1 loses to the XLA scan (13 ms) and how v2 wins:
#
#   * v1 launches one kernel per micro-step and round-trips ALL state —
#     including the (Ts, ...) aggregation — through HBM between steps.
#   * the gate/input convs stayed in XLA, where a channels-last conv with
#     C=2 pads the channel dim onto 128 lanes: a ~64x physical-memory blowup
#     on every conv operand. That layout tax, not FLOPs, dominates the
#     embedding (the convs are 5x5 stencils over 2->4 channels — there are
#     almost no FLOPs).
#
# v2 runs the ENTIRE scan in one pallas_call with grid (N, Tm), time
# innermost. TPU grid iterations execute sequentially and scratch persists
# across them, so each batch element keeps vmem/vavg/spike/seg/t_last and
# the aggregation resident in VMEM for all Tm steps; the (n, t) event block
# streams in via the BlockSpec pipeline. Both depth-stacked convs are
# computed INSIDE the kernel as explicit shift-FMA stencils over (H, W)
# planes (W on lanes, channels unrolled) — the natural layout for C=2, with
# zero lane padding waste beyond W -> multiple-of-128.
#
# Forward-only (eval/inference path), like v1: the XLA scan's VJP defines
# training gradients; equivalence tests assert elementwise equality.


def v2_supported(Tm: int, C_in: int, C_out: int, H: int, W: int,
                 depth: int, ksize: int, record: bool = False,
                 Ts: int = 4) -> bool:
    """Geometry gate: everything the kernel keeps resident must fit VMEM
    (v5e has 128 MB; we budget conservatively for double-buffered blocks
    and compiler temporaries)."""
    if record or depth > 2 or C_in != 2 or C_out != 2 or ksize > 7:
        return False
    p = ksize // 2
    lanes = -(-(W + 2 * p) // _LANES) * _LANES
    plane = (H + 2 * p) * lanes * 4
    # pad_in(2C) + inp/rec conv out (2 x 2C) + state(5 x C)
    # + agg(Ts x C, double-buffered out block) + ev(2 x Cin, double-buffered)
    est = plane * (
        2 * C_out + 2 * 2 * C_out + 5 * C_out + 2 * Ts * C_out + 2 * C_in
    )
    return est < 48 * 1024 * 1024


def _stencil_conv(pad_ref, out_ref, out_base, w_ref, b_ref, w_off, b_off,
                  ci_n, co_n, ksize, H, W, relu):
    """out_ref[out_base + co] = (relu?)(bias + sum_{ci,dy,dx} w*shifted(pad))

    pad_ref: (Cmax, H+pad, Wpad) zero-bordered scratch whose interior holds
    the layer input (Wpad is lane-aligned; columns beyond W+2p stay zero).
    Weights/biases are flat SMEM scalars, layout w[co, ci, dy, dx].

    Mosaic-survival design (each rule bought an order of magnitude):
      * fully-unrolled stencils (ksize^2*ci*co slice-FMAs) either spill
        ~190 MB of VMEM (value accumulators) or compile >15 min remotely —
        ci/dx/co are RUNTIME fori_loops (dynamic leading-dim ref indexing
        and dynamic roll shifts are legal); only dy stays unrolled because
        its sublane slice offset must be static;
      * dynamic unaligned lane slices are rejected — the dx shift is a
        ``pltpu.roll`` on the loaded row band + an ALIGNED [:W] slice (the
        lane-aligned buffer's zero columns wrap in, never reaching [:W]);
      * accumulation is IN-PLACE into scratch (`out_ref[co] += w*xs`) so
        the unrolled body carries no full-plane SSA values. A
        register-resident row-block variant (RB=64 value accumulators) was
        measured SLOWER (14.3 vs 10.3 ms/apply at Gen1-M geometry): the
        extra sublane rolls and loop scaffolding cost more than the saved
        VMEM read-modify-writes.
    """
    from jax.experimental.pallas import tpu as pltpu

    wp = pad_ref.shape[-1]  # lane-aligned padded width

    def bias_body(co, _):
        out_ref[out_base + co] = jnp.full((H, W), b_ref[b_off + co],
                                          jnp.float32)
        return 0

    jax.lax.fori_loop(0, co_n, bias_body, 0)

    for dy in range(ksize):  # static: sublane slice offset

        def ci_body(ci, _, dy=dy):
            band = pad_ref[ci, dy:dy + H, :]          # (H, Wpad)

            def dx_body(dx, _):
                # left-shift by dx == non-negative roll by wp - dx
                xs = pltpu.roll(band, wp - dx, 1)[:, :W]

                def co_body(co, _):
                    w = w_ref[
                        w_off
                        + ((co * ci_n + ci) * ksize + dy) * ksize + dx
                    ]
                    out_ref[out_base + co] = (
                        out_ref[out_base + co] + w * xs
                    )
                    return 0

                return jax.lax.fori_loop(0, co_n, co_body, 0)

            return jax.lax.fori_loop(0, ksize, dx_body, 0)

        jax.lax.fori_loop(0, ci_n, ci_body, 0)

    if relu:

        def relu_body(co, _):
            out_ref[out_base + co] = jnp.maximum(out_ref[out_base + co], 0.0)
            return 0

        jax.lax.fori_loop(0, co_n, relu_body, 0)


def _conv_stack_in_kernel(get_src, pad_ref, out_ref, w_ref, b_ref,
                          layer_dims, ksize, H, W):
    """Apply conv[ReLU conv]*(depth-1); result lands in out_ref[0:2C].

    get_src(ci) yields the first layer's input planes; intermediate layer
    outputs round-trip through out_ref -> pad_ref interior. layer_dims:
    [(ci, co), ...]; weights flat-packed per layer in w_ref/b_ref.
    """
    p = ksize // 2
    w_off = 0
    b_off = 0
    n_layers = len(layer_dims)
    for li, (ci_n, co_n) in enumerate(layer_dims):
        for ci in range(ci_n):
            src = get_src(ci) if li == 0 else out_ref[ci]
            pad_ref[ci, p:p + H, p:p + W] = src
        _stencil_conv(
            pad_ref, out_ref, 0, w_ref, b_ref, w_off, b_off, ci_n, co_n,
            ksize, H, W, relu=(li < n_layers - 1),
        )
        w_off += ci_n * co_n * ksize * ksize
        b_off += co_n


def _v2_kernel(
    ev_ref, iw_ref, ib_ref, gw_ref, gb_ref,
    agg_ref,
    vmem_ref, vavg_ref, spike_ref, seg_ref, tlast_ref, pad_ref,
    inp_ref, rec_ref,
    *,
    Tm, Ts, C, Cin, depth, ksize, H, W,
    thresh, vreset, readout, spike_attach, write_zero, use_abs,
):
    import jax.experimental.pallas as pl

    t = pl.program_id(1)
    f32 = jnp.float32
    layer_dims = [(Cin, 2 * C)] + [(2 * C, 2 * C)] * (depth - 1)
    layer_dims_g = [(C, 2 * C)] + [(2 * C, 2 * C)] * (depth - 1)

    @pl.when(t == 0)
    def _init():
        vmem_ref[...] = jnp.zeros_like(vmem_ref)
        vavg_ref[...] = jnp.zeros_like(vavg_ref)
        spike_ref[...] = jnp.zeros_like(spike_ref)
        seg_ref[...] = jnp.zeros_like(seg_ref)
        tlast_ref[...] = jnp.full_like(tlast_ref, -1)
        agg_ref[...] = jnp.zeros_like(agg_ref)
        # zero borders (interiors are overwritten before every read)
        pad_ref[...] = jnp.zeros_like(pad_ref)

    # input conv stack on this step's event planes -> inp_ref[0:2C]
    _conv_stack_in_kernel(
        lambda ci: ev_ref[0, 0, ci], pad_ref, inp_ref, iw_ref, ib_ref,
        layer_dims, ksize, H, W,
    )
    # gate conv stack on the previous spike planes -> rec_ref[0:2C]
    _conv_stack_in_kernel(
        lambda ci: spike_ref[ci], pad_ref, rec_ref, gw_ref, gb_ref,
        layer_dims_g, ksize, H, W,
    )

    tf = t.astype(f32)
    for c in range(C):
        gate = jax.nn.sigmoid(inp_ref[c] + rec_ref[c])
        current = inp_ref[C + c] + rec_ref[C + c]
        v = gate * vmem_ref[c] + current
        spike = (v - thresh > 0.0).astype(f32)
        v_noreset = v
        if vreset is None:
            v_after = v - thresh * spike
        else:
            v_after = v * (1.0 - spike) + vreset * spike
        vavg = vavg_ref[c] + v_noreset

        seg = seg_ref[c]
        spiked = spike > 0.5
        valid = spiked & (seg < Ts)
        if readout == "sum":
            w = vavg
        elif readout == "last":
            w = v_after
        elif readout == "avg":
            dt = jnp.maximum(tf - tlast_ref[c], 1.0)
            w = vavg / dt
        else:
            raise NotImplementedError(readout)
        # forward-only: spike is exactly 0/1 on the valid set, so
        # spike_attach does not change forward values — skip the multiply.
        write = jnp.where(valid, w, 0.0)
        for s in range(Ts):
            agg_ref[0, s, c] = agg_ref[0, s, c] + jnp.where(
                seg == s, write, 0.0
            )
        vmem_ref[c] = v_after
        spike_ref[c] = spike
        seg_ref[c] = seg + valid.astype(seg.dtype)
        tlast_ref[c] = jnp.where(valid, tf, tlast_ref[c])
        vavg_ref[c] = jnp.where(spiked, 0.0, vavg)

    @pl.when(t == Tm - 1)
    def _residual():
        for c in range(C):
            no_spike = spike_ref[c] <= 0.5
            seg = seg_ref[c]
            valid = no_spike & (seg < Ts)
            if readout == "sum":
                w = vavg_ref[c]
            elif readout == "last":
                w = vmem_ref[c]
            else:  # avg
                denom = jnp.maximum(float(Tm - 1) - tlast_ref[c], 1.0)
                w = vavg_ref[c] / denom
            if write_zero:
                w = w * 0.0
            write = jnp.where(valid, w, 0.0)
            for s in range(Ts):
                out = agg_ref[0, s, c] + jnp.where(seg == s, write, 0.0)
                if use_abs:
                    out = jnp.maximum(out, 0.0)
                agg_ref[0, s, c] = out


def _flat_w(weights):
    """[(kernel HWIO, bias), ...] -> (flat_w, flat_b) in w[co,ci,dy,dx]
    scalar order."""
    ws, bs = [], []
    for k, b in weights:
        ws.append(jnp.transpose(k, (3, 2, 0, 1)).reshape(-1))  # OIHW flat
        bs.append(b.reshape(-1))
    return jnp.concatenate(ws).astype(jnp.float32), jnp.concatenate(
        bs
    ).astype(jnp.float32)


def arsnn_fused_v2(
    events: jnp.ndarray,
    input_weights,
    gate_weights,
    *,
    Ts: int,
    thresh: float,
    vreset: Optional[float],
    readout: str = "sum",
    spike_attach: bool = False,
    write_zero: bool = False,
    use_abs: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Whole-scan-resident fused ARSNN sampler (forward only).

    Args:
      events: (Tm, N, H, W, Cin) time-major stack (already reversed).
      input_weights / gate_weights: [(kernel (k,k,ci,co) HWIO, bias (co,)),
        ...] for the depth-stacked convs.

    Returns (Ts, N, H, W, C).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Tm, N, H, W, Cin = events.shape
    ksize = input_weights[0][0].shape[0]
    C = input_weights[-1][0].shape[-1] // 2
    depth = len(input_weights)
    p = ksize // 2

    # (Tm, N, H, W, C) -> (N, Tm, C, H, W): planes with W on lanes
    ev = jnp.transpose(events, (1, 0, 4, 2, 3)).astype(jnp.float32)
    iw, ib = _flat_w(input_weights)
    gw, gb = _flat_w(gate_weights)

    kernel = functools.partial(
        _v2_kernel, Tm=Tm, Ts=Ts, C=C, Cin=Cin, depth=depth, ksize=ksize,
        H=H, W=W, thresh=float(thresh),
        vreset=None if vreset is None else float(vreset),
        readout=readout, spike_attach=spike_attach, write_zero=write_zero,
        use_abs=use_abs,
    )
    smem = lambda n: pl.BlockSpec(  # noqa: E731
        (n,), lambda i, j: (0,), memory_space=pltpu.SMEM
    )
    agg = pl.pallas_call(
        kernel,
        grid=(N, Tm),
        in_specs=[
            pl.BlockSpec((1, 1, Cin, H, W), lambda n, t: (n, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            smem(iw.shape[0]), smem(ib.shape[0]),
            smem(gw.shape[0]), smem(gb.shape[0]),
        ],
        out_specs=pl.BlockSpec(
            (1, Ts, C, H, W), lambda n, t: (n, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N, Ts, C, H, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, H, W), jnp.float32),       # vmem
            pltpu.VMEM((C, H, W), jnp.float32),       # vavg
            pltpu.VMEM((C, H, W), jnp.float32),       # spike
            pltpu.VMEM((C, H, W), jnp.int32),         # seg
            pltpu.VMEM((C, H, W), jnp.float32),       # t_last
            # width padded to a lane multiple for dynamic rotates; height
            # padded to an 8-aligned margin so row-block reads of
            # RB + align(2p) rows stay in bounds
            pltpu.VMEM(
                (
                    2 * C,
                    H + ((2 * p + 7) // 8) * 8,
                    -(-(W + 2 * p) // _LANES) * _LANES,
                ),
                jnp.float32,
            ),  # pad
            pltpu.VMEM((2 * C, H, W), jnp.float32),   # inp conv out
            pltpu.VMEM((2 * C, H, W), jnp.float32),   # rec conv out
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(ev, iw, ib, gw, gb)
    # (N, Ts, C, H, W) -> (Ts, N, H, W, C)
    return jnp.transpose(agg, (1, 0, 3, 4, 2))
