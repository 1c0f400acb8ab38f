"""Model parameter/FLOP reporting.

(reference: yolox/utils/model_utils.py:22-32 get_model_info via thop; here
params come from the tree and MACs from the 'sops' accounting collection —
no external profiler.)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["count_params", "get_model_info"]


def count_params(params) -> int:
    import jax

    return int(
        sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    )


def get_model_info(model, variables, sample_events) -> str:
    """'Params: N.NNM, Gflops: X.XX' (conv MACs only, x2 flops/mac)."""
    from ..evaluators.energy import count_ops

    n_params = count_params(variables.get("params", variables))
    ops = count_ops(model, variables, sample_events)
    macs = sum(float(v[1]) for v in ops.values())
    batch = sample_events.shape[0]
    return (
        f"Params: {n_params / 1e6:.2f}M, "
        f"Gflops: {2.0 * macs / batch / 1e9:.2f}"
    )
