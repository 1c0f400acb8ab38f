"""Parameter-tree surgery: conv+BN fusion and parameter freezing.

(reference: yolox/utils/model_utils.py:35-96 fuse_conv_and_bn/fuse_model,
:131-156 freeze_module — torch module surgery becomes pure pytree
transforms here.)
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import numpy as np

__all__ = ["fuse_conv_bn", "freeze_labels"]


def fuse_conv_bn(variables: Dict[str, Any], eps: float = 1e-3) -> Dict[str, Any]:
    """Fold eval-mode BatchNorm affine+stats into the preceding conv kernel.

    Works on any subtree holding sibling ``conv``/``bn`` modules (the
    BaseConv layout, models/blocks.py): the returned tree computes the exact
    same eval-mode function with BN reduced to a pure bias add
    (scale=1, mean=0, var=1-eps), saving one multiply per element.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def walk(p, s):
        if not isinstance(p, dict):
            return p
        out = {k: walk(v, s.get(k, {}) if isinstance(s, dict) else {})
               for k, v in p.items()}
        if "conv" in p and "bn" in p and isinstance(s, dict) and "bn" in s:
            kernel = np.array(p["conv"]["kernel"])
            scale = p["bn"]["scale"]
            bias = p["bn"]["bias"]
            mean = s["bn"]["mean"]
            var = s["bn"]["var"]
            g = scale / np.sqrt(var + eps)
            out["conv"] = dict(p["conv"], kernel=kernel * g)
            out["bn"] = dict(
                p["bn"],
                scale=np.ones_like(scale),
                bias=bias - mean * g,
            )
        return out

    def walk_stats(s, p):
        if not isinstance(s, dict):
            return s
        out = {k: walk_stats(v, p.get(k, {}) if isinstance(p, dict) else {})
               for k, v in s.items()}
        if "bn" in s and isinstance(p, dict) and "conv" in p and "bn" in p:
            out["bn"] = {
                "mean": np.zeros_like(s["bn"]["mean"]),
                "var": np.ones_like(s["bn"]["var"]) - eps,
            }
        return out

    return {
        **variables,
        "params": walk(params, stats),
        "batch_stats": walk_stats(stats, params),
    }


def freeze_labels(params: Dict[str, Any], prefixes: Sequence[str]):
    """Label tree for ``optax.multi_transform``: leaves under any of the
    given top-level prefixes -> 'frozen', others -> 'trainable'
    (reference freeze_module semantics)."""

    def walk(tree, frozen):
        if isinstance(tree, dict):
            return {
                k: walk(v, frozen or any(k == p or k.startswith(p) for p in prefixes))
                for k, v in tree.items()
            }
        return "frozen" if frozen else "trainable"

    return walk(params, False)
