"""Adaptive Recurrent SNN (ARSNN) sampling core — the paper's contribution.

A gated recurrent LIF runs over ``Tm`` micro-steps of the event stream; its
spikes *segment time*: each spike closes the current temporal slice for that
(pixel, channel) and writes a readout of the accumulated membrane into one of
``Ts`` aggregation slots. This module re-derives the reference's
data-dependent ``nonzero``-indexed scatter (reference:
yolox/models/embedding.py:141-226) as a dense, XLA-compilable
``lax.scan`` with masked one-hot segment writes — identical forward values
and gradients (incl. Spike-Aware Training ``spike_attach`` and Residual
Potential Dropout ``write_zero``), no data-dependent shapes.

The reference's early ``break`` when every element has ``Ts`` segments
(embedding.py:200-201) is dropped: once ``seg_ind >= Ts`` everywhere all
writes are masked invalid, so a full-length scan is value-identical and Tm is
small (<= 8).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .surrogate import SpikeFn

__all__ = ["arsnn_scan", "gated_lif_update"]


def gated_lif_update(
    vmem: jnp.ndarray,
    gate: jnp.ndarray,
    current: jnp.ndarray,
    thresh: float,
    vreset: Optional[float],
    spike_fn: SpikeFn,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gated LIF update: v <- gate*v + current, spike, reset.

    Returns (v_after_reset, v_no_reset, spike).
    (reference semantics: yolox/models/embedding.py:132-139)
    """
    v = gate * vmem + current
    spike = spike_fn(v - thresh)
    v_noreset = v
    if vreset is None:
        v = v - thresh * spike
    else:
        v = v * (1.0 - spike) + vreset * spike
    return v, v_noreset, spike


def _onehot_seg(seg_ind: jnp.ndarray, Ts: int) -> jnp.ndarray:
    """(…) int32 -> (Ts, …) float one-hot along a new leading axis."""
    iota = jnp.arange(Ts, dtype=seg_ind.dtype).reshape((Ts,) + (1,) * seg_ind.ndim)
    return (seg_ind[None] == iota)


def arsnn_scan(
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
    record: bool = False,
    unroll: int | bool = True,
    remat: bool = False,
    agg_mode: str = "carry",
):
    """Run the adaptive sampler over a time-major event stack.

    Args:
      events: (Tm, N, H, W, Cin) micro-frame stack, already time-reversed by
        the caller if reference parity is desired (embedding.py:155-156).
      input_conv_fn: maps (..., Cin) -> (..., 2*C); applied to all steps at
        once (time folded into batch) — one big MXU conv.
      gate_conv_fn: maps (..., C) -> (..., 2*C); applied to the previous
        spike map inside the scan (recurrence).
      Ts: number of aggregation slots (output temporal slices).
      readout: 'sum' | 'last' | 'avg' value written on spike
        (embedding.py:185-191).
      spike_attach: multiply written values by the surrogate spike (SAT,
        embedding.py:192-193).
      write_zero: zero the residual membrane of never-finished elements (RPD,
        embedding.py:215-216).
      use_abs: ReLU the final aggregation (embedding.py:218-220).
      record: additionally return the per-step last-spike-time maps.
      agg_mode: 'carry' (default) accumulates the (Ts, ...) aggregation
        inside the scan carry; 'ys' instead emits each step's masked write
        plane + target slot as scan outputs and materializes the
        aggregation in one pass after the scan. Identical values and
        gradients (the sum is just reordered). Measured on a v5e at
        flagship geometry (B=128 bf16, Tm=4): 'ys' is SLIGHTLY SLOWER
        (24.5 vs 23.1 ms) — the unrolled scan's in-carry accumulation is
        already fully fused by XLA, while 'ys' materializes the (Tm, ...)
        write/slot stacks to HBM and re-reads them. Negative result kept
        as an option for future geometries with larger Ts.

    Returns:
      aggregation: (Ts, N, H, W, C); and if ``record`` a (Tm, N, H, W, C)
      int32 stack of last-spike times.
    """
    Tm = events.shape[0]
    # One fused conv over all micro-steps (the tdLayer trick, layer.py:122).
    inpt_all = input_conv_fn(events.reshape((-1,) + events.shape[2:]))
    inpt_all = inpt_all.reshape((Tm,) + events.shape[1:-1] + (inpt_all.shape[-1],))
    g_in_all, c_in_all = jnp.split(inpt_all, 2, axis=-1)

    state_shape = g_in_all.shape[1:]
    f32 = events.dtype
    zero = jnp.zeros(state_shape, f32)
    # Segment counters and last-spike times are tiny ints (< Tm, Ts <= 127):
    # carrying them as int8 instead of int32 cuts their share of the scan's
    # HBM carry traffic 4x with bit-identical results.
    idt = jnp.int8

    agg_ys = agg_mode == "ys"

    def step(carry, xs):
        if agg_ys:
            vmem, spike_last, seg_ind, vmem_avg, t_last = carry
        else:
            vmem, spike_last, seg_ind, vmem_avg, t_last, agg = carry
        t, g_in, c_in = xs
        state = gate_conv_fn(spike_last)
        g_rec, c_rec = jnp.split(state, 2, axis=-1)
        gate = jax.nn.sigmoid(g_in + g_rec)
        current = c_in + c_rec
        vmem, v_noreset, spike = gated_lif_update(
            vmem, gate, current, thresh, vreset, spike_fn
        )
        vmem_avg = vmem_avg + v_noreset

        # Control masks are non-differentiable (forward spikes are exact 0/1).
        spiked = jax.lax.stop_gradient(spike) > 0.5
        valid = spiked & (seg_ind < Ts)

        if readout == "sum":
            v = vmem_avg
        elif readout == "last":
            v = vmem
        elif readout == "avg":
            dt = jnp.maximum(t - t_last, 1).astype(f32)
            v = vmem_avg / dt
        else:
            raise NotImplementedError(f"readout '{readout}'")
        if spike_attach:
            v = v * spike  # re-attach surrogate spike gradient (SAT)

        write = jnp.where(valid, v, 0.0)
        seg_pre = seg_ind
        seg_ind = seg_ind + valid.astype(seg_ind.dtype)
        t_last = jnp.where(valid, t, t_last)
        vmem_avg = jnp.where(spiked, 0.0, vmem_avg)
        if agg_ys:
            new_carry = (vmem, spike, seg_ind, vmem_avg, t_last)
            ys = (write, seg_pre, t_last) if record else (write, seg_pre)
        else:
            agg = agg + _onehot_seg(seg_pre, Ts) * write[None]
            new_carry = (vmem, spike, seg_ind, vmem_avg, t_last, agg)
            ys = t_last if record else None
        return new_carry, ys

    init = (
        zero,  # vmem
        zero,  # spike_last
        jnp.zeros(state_shape, idt),  # seg_ind
        zero,  # vmem_avg
        jnp.full(state_shape, -1, idt),  # t_last
    )
    if not agg_ys:
        init = init + (jnp.zeros((Ts,) + state_shape, f32),)  # aggregation
    ts = jnp.arange(Tm, dtype=idt)
    if remat:
        # per-step rematerialization: the backward pass recomputes each
        # step's internals from its (small) carry instead of storing every
        # gate/current/surrogate plane for all Tm steps — cuts the scan's
        # saved-residual memory ~4x at flagship geometry for ~one extra
        # forward of the step in the backward
        step = jax.checkpoint(step)
    final, ys_out = jax.lax.scan(
        step, init, (ts, g_in_all, c_in_all), unroll=unroll
    )
    if agg_ys:
        vmem, spike, seg_ind, vmem_avg, t_last = final
        if record:
            writes, segs, t_rec = ys_out
        else:
            writes, segs = ys_out
            t_rec = None
        # One fused pass builds the aggregation: sum over the Tm step
        # planes, each routed to its (pre-increment) slot. Identical to the
        # in-carry accumulation (the sum is associative and the one-hot
        # masks carry no gradient).
        agg = jnp.sum(_onehot_seg(segs, Ts) * writes[None], axis=1)
    else:
        vmem, spike, seg_ind, vmem_avg, t_last, agg = final
        t_rec = ys_out

    # Residual write for elements that never closed their last segment
    # (embedding.py:203-217).
    no_spike = jax.lax.stop_gradient(spike) <= 0.5
    valid = no_spike & (seg_ind < Ts)
    if readout == "sum":
        v = vmem_avg
    elif readout == "last":
        v = vmem
    elif readout == "avg":
        denom = jnp.maximum(Tm - 1 - t_last, 1).astype(f32)
        v = vmem_avg / denom
    if write_zero:
        v = v * 0.0  # RPD: drop residual potential (and its gradient)
    write = jnp.where(valid, v, 0.0)
    agg = agg + _onehot_seg(seg_ind, Ts) * write[None]

    if use_abs:
        agg = jax.nn.relu(agg)
    if record:
        return agg, t_rec.astype(jnp.int32)
    return agg
