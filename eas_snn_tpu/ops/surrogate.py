"""Surrogate-gradient spike functions (Spike-Aware Training machinery).

TPU-native re-design of the reference's ``torch.autograd.Function`` surrogates
(reference: yolox/models/activation.py:17-205): each function forwards a hard
Heaviside spike and backpropagates a smooth pseudo-derivative, implemented
here with ``jax.custom_vjp`` (or straight-through estimators where the
reference itself is straight-through, e.g. ASGL).

All functions are elementwise, shape-polymorphic, and dtype-preserving, so XLA
fuses them into the surrounding convolution epilogues on TPU.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "rectangle",
    "atan_spike",
    "sigmoid_spike",
    "tanh_spike",
    "asgl_spike",
    "get_spike_fn",
    "SpikeFn",
]

# A spike function maps membrane-minus-threshold -> {0, 1} with a surrogate
# gradient. Signature: (x) -> spikes, with alpha closed over.
SpikeFn = Callable[[jnp.ndarray], jnp.ndarray]


# ---------------------------------------------------------------------------
# Rectangle (boxcar) surrogate.
# Forward: (x > 0); backward: g * alpha * [|x| < 0.5/alpha].
# Reference semantics: yolox/models/activation.py:17-30.
# ---------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def rectangle(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    return (x > 0).astype(x.dtype)


def _rectangle_fwd(x, alpha):
    return rectangle(x, alpha), x


def _rectangle_bwd(alpha, x, g):
    sur = (jnp.abs(x) < 0.5 / alpha).astype(g.dtype) * alpha
    return (g * sur,)


rectangle.defvjp(_rectangle_fwd, _rectangle_bwd)


# ---------------------------------------------------------------------------
# ATan surrogate (spikingjelly-compatible).
# Forward: (x >= 0); backward: g * (alpha/2) / (1 + (pi/2 * alpha * x)^2).
# ---------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def atan_spike(x: jnp.ndarray, alpha: float = 2.0) -> jnp.ndarray:
    return (x >= 0).astype(x.dtype)


def _atan_fwd(x, alpha):
    return atan_spike(x, alpha), x


def _atan_bwd(alpha, x, g):
    t = (math.pi / 2.0) * alpha * x
    sur = (alpha / 2.0) / (1.0 + t * t)
    return (g * sur,)


atan_spike.defvjp(_atan_fwd, _atan_bwd)


# ---------------------------------------------------------------------------
# Sigmoid surrogate.
# Forward: (x >= 0); backward: g * alpha * sigm(alpha x) (1 - sigm(alpha x)).
# Reference semantics: yolox/models/activation.py:33-53 (SigmoidSG) and
# spikingjelly surrogate.Sigmoid.
# ---------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def sigmoid_spike(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    return (x >= 0).astype(x.dtype)


def _sigmoid_fwd(x, alpha):
    return sigmoid_spike(x, alpha), x


def _sigmoid_bwd(alpha, x, g):
    s = jax.nn.sigmoid(alpha * x)
    return (g * alpha * s * (1.0 - s),)


sigmoid_spike.defvjp(_sigmoid_fwd, _sigmoid_bwd)


# ---------------------------------------------------------------------------
# Tanh surrogate.
# Forward: (x > 0); backward: g * 0.5 * alpha * (1 - tanh(alpha x)^2).
# Reference semantics: yolox/models/activation.py:90-103.
# ---------------------------------------------------------------------------
@partial(jax.custom_vjp, nondiff_argnums=(1,))
def tanh_spike(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    return (x > 0).astype(x.dtype)


def _tanh_fwd(x, alpha):
    return tanh_spike(x, alpha), x


def _tanh_bwd(alpha, x, g):
    t = jnp.tanh(alpha * x)
    return (g * 0.5 * alpha * (1.0 - t * t),)


tanh_spike.defvjp(_tanh_fwd, _tanh_bwd)


# ---------------------------------------------------------------------------
# ASGL straight-through spike ("patan" in reference configs): the forward is a
# random mixture of the hard spike and the smooth inverse surrogate; gradients
# flow through the smooth part (and through a *learnable* alpha).
# Reference semantics: activation.py:121-131 (InvArcTanh) + :181-205
# (EfficientNoisySpikeII). With p=0 (the config default) the forward is the
# hard spike and the gradient equals the ATan surrogate.
# ---------------------------------------------------------------------------
def inv_arctanh(x: jnp.ndarray, alpha) -> jnp.ndarray:
    """Smooth CDF-like squashing: 1/pi * atan(pi/2 * |alpha| * x) + 0.5."""
    return (1.0 / math.pi) * jnp.arctan((math.pi / 2.0) * jnp.abs(alpha) * x) + 0.5


def asgl_spike(
    x: jnp.ndarray,
    alpha,
    p: float = 0.0,
    key: Optional[jax.Array] = None,
    training: bool = True,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """ASGL straight-through spike with mixing probability ``p``.

    When training, each element independently uses the hard spike with
    probability (1 - p) and the smooth value with probability p; the backward
    pass always follows the smooth function (straight-through). ``alpha`` may
    be a traced (learnable) array (reference keeps InvArcTanh's temperature
    an ``nn.Parameter``, activation.py:121-131).

    ``mask`` (same shape as x, values in {0,1}: 1 = hard spike) overrides the
    key-derived Bernoulli draw — used by parity tests to inject the exact
    mask a torch ``EfficientNoisySpikeII`` instance holds.
    """
    sig = inv_arctanh(x, alpha)
    hard = (x >= 0).astype(x.dtype)
    if not training:
        return hard
    if mask is None:
        if p <= 0.0 or key is None:
            mask = 1.0
        else:
            mask = jax.random.bernoulli(key, 1.0 - p, x.shape).astype(x.dtype)
    return sig + jax.lax.stop_gradient((hard - sig) * mask)


def get_spike_fn(name: str, alpha: float = 2.0) -> SpikeFn:
    """Registry mirroring the reference's spike_fn config knob.

    (reference: yolox/exp/event_yolox_base.py:144-151)
    """
    if name == "rect":
        return lambda x: rectangle(x, 1.0)
    if name == "atan":
        return lambda x: atan_spike(x, alpha)
    if name == "sigmoid":
        return lambda x: sigmoid_spike(x, alpha)
    if name == "tanh":
        return lambda x: tanh_spike(x, alpha)
    if name == "patan":
        return lambda x: asgl_spike(x, alpha, p=0.0)
    raise KeyError(f"unknown spike_fn '{name}'")
