"""Pallas-fused ARSNN adaptive-sampling step.

The scientific hot loop (reference: yolox/models/embedding.py:170-201;
SURVEY.md §3.5) interleaves a recurrent gate conv (MXU, stays in XLA) with a
long elementwise chain: gated LIF membrane update, surrogate threshold,
soft/hard reset, running no-reset integral, segment bookkeeping, and the
masked one-hot write into the ``Ts`` aggregation slots (incl. Spike-Aware
``spike_attach`` and the RPD ``write_zero`` path at the end). This module
fuses that whole chain — membrane update, threshold/reset, readout,
segment scatter — into ONE Pallas kernel per scan step: a single pass over
the state tiles in VMEM instead of XLA's several fusions, with the
(Ts, ...) aggregation updated in place via ``input_output_aliases``.

Status: equivalence-tested against the XLA scan for every readout/reset/
SAT/RPD combination, but honest forced-materialization profiling on v5e
measures XLA's own scan fusion FASTER (~13 vs ~49 ms device for the Gen1-M
embedding) — per-step kernel launches and HBM round-trips of the (Ts, ...)
aggregation dominate. The kernel therefore stays opt-in
(``ARSNNEmbedding(use_pallas='always')``); a whole-scan-resident redesign
(aggregation pinned in VMEM across steps, conv results DMA'd in) is the
planned follow-up.

Layout: all state is flattened to (R, 128) lanes and tiled over a 1-D grid;
the aggregation rides along as (Ts, R, 128).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from .surrogate import SpikeFn

__all__ = ["arsnn_scan_fused", "fused_step_reference"]

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
