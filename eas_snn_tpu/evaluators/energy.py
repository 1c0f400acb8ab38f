"""Synaptic-operation counting and energy estimation.

(reference: yolox/evaluators/event_evaluator.py:466-565 energy_estimation +
yolox/utils/hooks.py:31-116 — the reference installs forward hooks and
replays Conv/Linear layers with all-ones weights to count synaptic ops;
here every BaseConv sows an exact ones-kernel op count into the 'sops'
collection (models/blocks.py), so one ``apply`` with ``mutable=['sops']``
yields the whole profile with no hooks and no replay.)

Energy model constants from the reference (:561-563):
0.9 pJ per synaptic op (spike-driven) vs 4.6 pJ per MAC (dense).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

__all__ = ["count_ops", "estimate_energy", "E_SOP_PJ", "E_MAC_PJ"]

E_SOP_PJ = 0.9
E_MAC_PJ = 4.6


def _walk(tree: Any, path: Tuple[str, ...], out: Dict[str, np.ndarray]):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _walk(v, path + (k,), out)
    elif isinstance(tree, (tuple, list)):
        # sow stores a tuple of values per call site
        total = np.zeros(3, np.float64)
        for v in tree:
            total += np.asarray(v, np.float64)
        out["/".join(p for p in path if p != "ops")] = total


def conv_macs_per_frame(model, sample_shape, dtype=None) -> float:
    """Conv MACs per input frame, computed entirely on the CPU backend with
    zero-filled parameters (MACs are shape-static; SOPs are not). Exists
    because jitting the full model through a relayed TPU backend just to
    read one static number stalls startup for minutes."""
    import jax
    import jax.numpy as jnp

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ev = jnp.zeros(sample_shape, dtype or jnp.float32)
        shapes = jax.eval_shape(
            lambda k: model.init(k, ev, train=False), jax.random.PRNGKey(0)
        )
        variables = jax.tree_util.tree_map(
            lambda sh: jnp.zeros(sh.shape, sh.dtype), shapes
        )
        ops = count_ops(model, variables, ev)
    macs = sum(float(v[1]) for v in ops.values())
    return macs / sample_shape[0]


def count_ops(model, variables, events, **apply_kwargs) -> Dict[str, np.ndarray]:
    """Run one forward pass collecting per-module [sops, macs, is_spiking].

    Returns {module_path: array([sops, macs, spiking])}.
    """
    import jax

    # jit: an eager apply dispatches each op separately (minutes over a
    # relayed TPU backend); one compiled program runs in seconds.
    @jax.jit
    def _run(v, e):
        return model.apply(
            {k: x for k, x in v.items() if k != "sops"},
            e, train=False, mutable=["sops"], **apply_kwargs,
        )

    _, aux = _run(variables, events)
    out: Dict[str, np.ndarray] = {}
    _walk(
        {k: v for k, v in aux.get("sops", {}).items()}, (), out
    )
    return out


def estimate_energy(
    model, variables, events, **apply_kwargs
) -> Dict[str, float]:
    """Whole-model energy split into spiking (SOP) and dense (MAC) parts
    (reference event_evaluator.py:544-565)."""
    ops = count_ops(model, variables, events, **apply_kwargs)
    sops = sum(float(v[0]) for v in ops.values() if v[2] > 0)
    macs_snn_modules = sum(float(v[1]) for v in ops.values() if v[2] > 0)
    macs = sum(float(v[1]) for v in ops.values() if v[2] == 0)
    batch = events.shape[0]
    return {
        "sops": sops / batch,
        "dense_macs": macs / batch,
        "snn_equivalent_macs": macs_snn_modules / batch,
        "snn_energy_mJ": sops / batch * E_SOP_PJ * 1e-9,
        "ann_energy_mJ": macs / batch * E_MAC_PJ * 1e-9,
        "total_energy_mJ": (sops * E_SOP_PJ + macs * E_MAC_PJ) / batch * 1e-9,
    }
