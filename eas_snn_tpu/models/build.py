"""Model zoo: build named models, optionally loading local checkpoints.

(reference: yolox/models/build.py:36-111 create_yolox_model + per-size
helpers — the reference downloads torch checkpoints from GitHub; this
environment has no egress, so weights load from local paths: either our
Orbax trees or reference ``.pth`` files through the torch importer.)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

__all__ = ["MODEL_SPECS", "ZOO_CKPTS", "create_model", "load_weights"]

# Zoo checkpoint artifacts, resolvable by zoo name (reference
# yolox/models/build.py:36-47 downloads by name from GitHub; no egress
# here, so the artifact is a reference-initialized .pth checked into the
# repo — see tools/make_reference_ckpt.py). Paths are relative to the
# repository root.
ZOO_CKPTS: Dict[str, str] = {
    "syolox-s-gen1": "checkpoints/syolox_s_gen1_init.pth",
}

# name -> (depth, width, kwargs)
MODEL_SPECS: Dict[str, Tuple[float, float, Dict[str, Any]]] = {
    "yolox-s": (0.33, 0.50, dict(use_spike="none", embedding="count", num_classes=80)),
    "yolox-m": (0.67, 0.75, dict(use_spike="none", embedding="count", num_classes=80)),
    "yolox-l": (1.00, 1.00, dict(use_spike="none", embedding="count", num_classes=80)),
    "syolox-s-gen1": (
        0.33, 0.50,
        dict(use_spike="backbone", embedding="arsnn", embedding_depth=2,
             embedding_ksize=5, Ts=3, T=3, readout="sum", write_zero=True,
             vreset=None, spike_fn="atan", num_classes=2),
    ),
    "syolox-m-gen1": (
        0.67, 0.75,
        dict(use_spike="backbone", embedding="arsnn", embedding_depth=2,
             embedding_ksize=5, Ts=3, T=3, readout="sum", write_zero=True,
             vreset=None, spike_fn="atan", num_classes=2),
    ),
    "syolox-m-ncaltech": (
        0.67, 0.75,
        dict(use_spike="backbone", embedding="arsnn", embedding_depth=2,
             embedding_ksize=5, Ts=3, T=3, readout="sum", write_zero=True,
             vreset=None, spike_fn="atan", alpha=1.5, num_classes=100),
    ),
    "syolox-m-gen4": (
        0.67, 0.75,
        dict(use_spike="backbone", embedding="arsnn", embedding_depth=2,
             embedding_ksize=5, Ts=3, T=3, readout="sum", write_zero=True,
             vreset=None, spike_fn="atan", num_classes=3),
    ),
}


def create_model(name: str, num_classes: Optional[int] = None, **overrides):
    """Build an EASYOLOX by zoo name (reference create_yolox_model:36)."""
    from .yolox import EASYOLOX

    key = name.lower().replace("_", "-")
    if key not in MODEL_SPECS:
        raise KeyError(
            f"unknown model '{name}'; available: {sorted(MODEL_SPECS)}"
        )
    depth, width, kw = MODEL_SPECS[key]
    kw = dict(kw, depth=depth, width=width)
    if num_classes is not None:
        kw["num_classes"] = num_classes
    kw.update(overrides)
    return EASYOLOX(**kw)


def load_weights(variables, ckpt_path: str):
    """Load weights from a local checkpoint into ``variables``:
    a zoo name resolves via ``ZOO_CKPTS``, ``.pth`` goes through the torch
    importer, anything else is treated as an Orbax tree (shape-checked
    partial load)."""
    key = ckpt_path.lower().replace("_", "-")
    if key in ZOO_CKPTS:
        import os

        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        ckpt_path = os.path.join(repo_root, ZOO_CKPTS[key])
    if ckpt_path.endswith((".pth", ".pt")):
        from ..utils.torch_import import (
            load_torch_state_dict,
            translate_torch_checkpoint,
        )

        new_vars, report = translate_torch_checkpoint(
            load_torch_state_dict(ckpt_path), variables
        )
        return new_vars, report
    import os

    import orbax.checkpoint as ocp

    from ..core.checkpoint import load_partial_params

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(ckpt_path))
    params = restored.get("ema_params") or restored.get("params", restored)
    new_vars = dict(variables)
    new_vars["params"] = load_partial_params(variables["params"], params)
    if "batch_stats" in restored:
        new_vars["batch_stats"] = restored["batch_stats"]

    import jax

    total = len(jax.tree_util.tree_leaves(variables["params"]))
    kept = sum(
        old is new
        for old, new in zip(
            jax.tree_util.tree_leaves(variables["params"]),
            jax.tree_util.tree_leaves(new_vars["params"]),
        )
    )
    return new_vars, {"mapped": total - kept, "kept_current": kept,
                      "total": total}
