"""Shared benchmarking helpers (single source of truth for bench.py and
tools/bench_suite.py).

Methodology notes that every caller inherits:
  * forced materialization — a host-side scalar read per call; on the axon
    relay ``block_until_ready`` returns before execution finishes;
  * depth-1 software pipelining — issue call i+1 before forcing call i, so
    steady-state throughput is measured rather than round-trip latency;
  * best-of-N rounds — the relay's delivered throughput swings by >10x
    (the same batch-128 forward measured 1130 / 539 / 98 f/s across runs);
    the best round reflects device capability, the rest the tunnel;
  * inputs generated ON DEVICE — staging ~GB host batches through the
    relay tunnel takes tens of minutes.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

__all__ = ["V5E_BF16_PEAK", "device_batches", "pipelined_fps"]

# TPU v5e (v5 lite) peak bf16 FLOP/s per chip
V5E_BF16_PEAK = 197e12


def device_batches(shape, n: int = 3, seed: int = 0, lam: float = 0.2,
                   dtype=None):
    """n distinct Poisson event batches generated on device (so no relay
    layer can elide repeated identical executions). ``dtype`` defaults to
    f32; bf16 halves bench-input HBM (counts <=256 are exact in bf16)."""
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    gen = jax.jit(
        lambda k: jax.random.poisson(k, lam, shape).astype(dtype)
    )
    out = [gen(jax.random.PRNGKey(seed * 100 + i)) for i in range(n)]
    for b in out:
        b.block_until_ready()
    return out


def pipelined_fps(
    fn: Callable,
    batches: Sequence,
    batch_size: int,
    n_iters: int = 12,
    rounds: int = 3,
) -> float:
    """Best-of-``rounds`` pipelined frames/s. ``fn(batch)`` must return a
    scalar (or a tuple whose last element is a scalar) to force."""

    def force(r):
        s = r[-1] if isinstance(r, tuple) else r
        return float(s)

    def one_round():
        prev = fn(batches[0])
        t0 = time.perf_counter()
        for i in range(1, n_iters):
            s = fn(batches[i % len(batches)])
            force(prev)
            prev = s
        force(prev)
        return batch_size * n_iters / (time.perf_counter() - t0)

    return max(one_round() for _ in range(rounds))
