"""Leaky-integrate-and-fire neuron dynamics as pure functions.

TPU-native re-design of the reference's stateful ``LIFCell``/``LIFLayer``
modules (reference: yolox/models/cell.py:21-86, layer.py:38-69) and of
spikingjelly's ``ParametricLIFNode`` used by the converted spiking backbone
(reference: yolox/utils/utils_snn.py:45-52). Neuron state is carried
explicitly through ``jax.lax.scan`` — there is no ``reset_net``; a fresh call
is a fresh neuron.

Conventions:
  * membrane decay is stored as a logit; the effective decay is
    ``sigmoid(decay)`` (reference: cell.py:47, utils/util.py:278-280);
  * time is the leading axis of sequence tensors: (T, ...);
  * soft reset when ``vreset`` is None (v -= thresh * spike), hard reset
    otherwise (v = v*(1-s) + vreset*s).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .surrogate import SpikeFn

__all__ = ["lif_step", "lif_scan", "plif_step", "plif_scan", "PLIF_W_INIT"]


def lif_step(
    vmem: jnp.ndarray,
    psp: jnp.ndarray,
    decay: jnp.ndarray,
    thresh: float,
    vreset: Optional[float],
    spike_fn: SpikeFn,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One LIF update. Returns (v_after_reset, v_no_reset, spike).

    v <- sigmoid(decay) * v + psp ; spike = f(v - thresh) ; reset.
    (reference semantics: yolox/models/cell.py:37-65)
    """
    v = jax.nn.sigmoid(decay) * vmem + psp
    spike = spike_fn(v - thresh)
    v_noreset = v
    if vreset is None:
        v = v - thresh * spike
    else:
        v = v * (1.0 - spike) + vreset * spike
    return v, v_noreset, spike


def lif_scan(
    psp_seq: jnp.ndarray,
    decay: jnp.ndarray,
    thresh: float,
    vreset: Optional[float],
    spike_fn: SpikeFn,
    unroll: int | bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run LIF over a (T, ...) presynaptic-current sequence.

    Returns (spikes (T, ...), final_vmem, sum of no-reset membranes).
    The sum-of-membranes output feeds the 'sum' readout of LIFEmbedding
    (reference: yolox/models/embedding.py:65-72).
    """

    def step(carry, psp):
        v, vsum = carry
        v, v_noreset, s = lif_step(v, psp, decay, thresh, vreset, spike_fn)
        return (v, vsum + v_noreset), s

    zero = jnp.zeros_like(psp_seq[0])
    (v_final, v_sum), spikes = jax.lax.scan(
        step, (zero, zero), psp_seq, unroll=unroll
    )
    return spikes, v_final, v_sum


# ---------------------------------------------------------------------------
# Parametric LIF (PLIF) — the activation used throughout converted spiking
# backbones. Matches spikingjelly ParametricLIFNode(init_tau=2.0,
# decay_input=False, v_threshold=1.0, v_reset=None, detach_reset=False)
# as instantiated at reference utils_snn.py:45-52:
#     v <- v * (1 - sigmoid(w)) + x ; spike = f(v - 1) ; v <- v - spike.
# ---------------------------------------------------------------------------

# w = -log(init_tau - 1); init_tau=2.0 -> w = 0.0 (sigmoid(w) = 0.5).
PLIF_W_INIT = 0.0


def plif_step(
    vmem: jnp.ndarray,
    x: jnp.ndarray,
    w: jnp.ndarray,
    spike_fn: SpikeFn,
    thresh: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One PLIF update (decay_input=False, soft reset). Returns (v, spike)."""
    v = vmem * (1.0 - jax.nn.sigmoid(w)) + x
    spike = spike_fn(v - thresh)
    v = v - thresh * spike
    return v, spike


def plif_scan(
    x_seq: jnp.ndarray,
    w: jnp.ndarray,
    spike_fn: SpikeFn,
    thresh: float = 1.0,
    v0: Optional[jnp.ndarray] = None,
    unroll: int | bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run PLIF over a (T, ...) sequence. Returns (spikes (T, ...), final v).

    ``v0`` lets streaming inference carry membrane state across windows
    (an extension over the reference, which resets every iteration).
    """

    def step(v, x):
        v, s = plif_step(v, x, w, spike_fn, thresh)
        return v, s

    if v0 is None:
        v0 = jnp.zeros_like(x_seq[0])
    v_final, spikes = jax.lax.scan(step, v0, x_seq, unroll=unroll)
    return spikes, v_final
