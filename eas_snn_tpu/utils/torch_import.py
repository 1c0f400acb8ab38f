"""Import reference PyTorch checkpoints into this framework's param tree.

Checkpoint-parity harness (SURVEY.md §7 stage 5): loads an EAS-SNN `.pth`
state dict (torch CPU, no spikingjelly needed) and maps every conv/BN leaf
onto our Flax tree, so data-pipeline and model bugs can be isolated against
the reference's trained weights.

Name mapping (reference module paths -> ours):
  backbone.backbone.stem.conv        -> backbone/backbone/stem/conv
  backbone.backbone.dark2.0 / .1     -> dark2_conv / dark2_csp
  backbone.backbone.dark5.0/.1/.2    -> dark5_conv / dark5_spp / dark5_csp
  backbone.{lateral_conv0,C3_p4,...} -> same names
  head.stems.K / cls_convs.K.J / cls_preds.K (etc.)
                                     -> stem{K} / cls_conv{K}_{J} / cls_pred{K}
  embedding.input_conv.S / gate_conv.S (sequential conv index, ReLUs skipped)
                                     -> embedding/{input,gate}_conv_kernel{i}
Layouts: torch conv OIHW -> flax HWIO; BN weight/bias -> scale/bias,
running_mean/var -> batch_stats. Spiking-converted checkpoints are
normalized by stripping spikingjelly container tokens ('module', numeric
SeqToANNContainer indices after known leaves).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

__all__ = ["load_torch_state_dict", "translate_torch_checkpoint"]


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a .pth checkpoint into {name: ndarray} (handles the reference's
    {'model': state_dict} wrapping and DDP 'module.' prefixes,
    tools/eval_event.py:178-184)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    sd = obj.get("model", obj) if isinstance(obj, dict) else obj
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        try:
            out[k] = v.detach().cpu().numpy()
        except AttributeError:
            out[k] = np.asarray(v)
    return out


_DARK_SEQ = {
    ("dark2", "0"): "dark2_conv", ("dark2", "1"): "dark2_csp",
    ("dark3", "0"): "dark3_conv", ("dark3", "1"): "dark3_csp",
    ("dark4", "0"): "dark4_conv", ("dark4", "1"): "dark4_csp",
    ("dark5", "0"): "dark5_conv", ("dark5", "1"): "dark5_spp",
    ("dark5", "2"): "dark5_csp",
}

_HEAD_LISTS = {
    "stems": "stem{k}",
    "cls_preds": "cls_pred{k}",
    "reg_preds": "reg_pred{k}",
    "obj_preds": "obj_pred{k}",
}


def _normalize(name: str) -> str:
    """Strip spikingjelly wrapper tokens from converted checkpoints."""
    parts = [p for p in name.split(".") if p != "module"]
    return ".".join(parts)


def _map_name(name: str) -> Tuple[Tuple[str, ...], str]:
    """torch param name -> (our module path, leaf kind).

    leaf kind in {'kernel', 'bn_scale', 'bn_bias', 'bn_mean', 'bn_var',
    'bias', 'skip'}.
    """
    name = _normalize(name)
    parts = name.split(".")
    leaf = parts[-1]
    body = parts[:-1]

    # leaf kind
    if body and body[-1] == "bn":
        kind = {
            "weight": "bn_scale", "bias": "bn_bias",
            "running_mean": "bn_mean", "running_var": "bn_var",
            "num_batches_tracked": "skip",
        }.get(leaf, "skip")
        body = body[:-1] + ["bn"]
    elif leaf == "weight":
        kind = "kernel"
    elif leaf == "bias":
        kind = "bias"
    elif leaf == "w" and body and body[-1] == "act":
        # spiking-converted act: ParametricLIFNode scalar decay logit
        # (utils_snn.py:44-53) -> our PLIF module's 'w' param (blocks.py).
        kind = "plif_w"
        body = body[:-1] + ["PLIF_0"]
    else:
        return (), "skip"

    out = []
    i = 0
    while i < len(body):
        p = body[i]
        # convert_to_spiking container indices (utils_snn.py:22-27): the
        # Focus stem is wrapped whole ('stem.0.conv...') and every Conv2d
        # attribute gains a SeqToANNContainer '0' child ('conv.0.weight').
        if p == "stem" and i + 1 < len(body) and body[i + 1] == "0":
            out.append("stem")
            i += 2
            continue
        if p == "0" and out and out[-1] == "conv":
            i += 1
            continue
        if p in ("dark2", "dark3", "dark4", "dark5") and i + 1 < len(body):
            out.append(_DARK_SEQ.get((p, body[i + 1]), f"{p}_{body[i+1]}"))
            i += 2
            continue
        if p == "m" and i + 1 < len(body) and body[i + 1].isdigit():
            out.append(f"m{body[i+1]}")
            i += 2
            continue
        if p in _HEAD_LISTS and i + 1 < len(body):
            out.append(_HEAD_LISTS[p].format(k=body[i + 1]))
            i += 2
            continue
        if p in ("cls_convs", "reg_convs") and i + 2 < len(body):
            stem = "cls_conv" if p == "cls_convs" else "reg_conv"
            out.append(f"{stem}{body[i+1]}_{body[i+2]}")
            i += 3
            continue
        out.append(p)
        i += 1
    return tuple(out), kind


def _set_leaf(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> bool:
    node = tree
    for p in path[:-1]:
        if not isinstance(node, dict) or p not in node:
            return False
        node = node[p]
    leaf = path[-1]
    if not isinstance(node, dict) or leaf not in node:
        return False
    cur = np.asarray(node[leaf])
    if cur.shape != value.shape:
        return False
    node[leaf] = value.astype(cur.dtype)
    return True


def translate_torch_checkpoint(
    state_dict: Dict[str, np.ndarray],
    variables: Dict[str, Any],
    verbose: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, int]]:
    """Map a reference state dict onto a copy of ``variables``.

    Returns (new_variables, report) with counts of mapped/missed leaves.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, variables.get("batch_stats", {})
    )
    report = {"mapped": 0, "shape_miss": 0, "unmapped": 0, "skipped": 0}

    # per-module sequential conv counter for the embedding conv stacks
    emb_conv_idx: Dict[Tuple[str, ...], Dict[str, int]] = {}

    for name, value in state_dict.items():
        path, kind = _map_name(name)
        if kind == "skip":
            report["skipped"] += 1
            continue

        # embedding sequential convs: embedding.input_conv.<S>.{weight,bias};
        # tdLayer-wrapped stacks add a 'layer' token
        # (embedding.embedding_conv.layer.<S>, embedding.input_conv.layer.<S>)
        if (
            len(path) >= 4 and path[0] == "embedding"
            and path[2] == "layer" and path[3].isdigit()
            and path[1] in ("embedding_conv", "input_conv", "gate_conv", "agg_conv")
        ):
            name = "conv" if path[1] == "embedding_conv" else path[1]
            path = ("embedding", name, path[3])
        # split agg convs: plain Conv2d, no sequential index
        # (reference embedding.py:100-102)
        if len(path) == 2 and path[0] == "embedding" and path[1] in (
            "input_conv_agg", "gate_conv_agg"
        ):
            leaf = f"{path[1]}_kernel0" if kind == "kernel" else f"{path[1]}_bias0"
            v = value.transpose(2, 3, 1, 0) if kind == "kernel" else value
            ok = _set_leaf(params, ("embedding", leaf), v)
            report["mapped" if ok else "shape_miss"] += 1
            continue
        if len(path) >= 3 and path[0] == "embedding" and path[1] in (
            "input_conv", "gate_conv", "agg_conv", "conv"
        ) and path[2].isdigit():
            key = (path[0], path[1])
            counters = emb_conv_idx.setdefault(key, {})
            conv_i = counters.setdefault(path[2], len(counters))
            leaf = (
                f"{path[1]}_kernel{conv_i}" if kind == "kernel"
                else f"{path[1]}_bias{conv_i}"
            )
            v = value.transpose(2, 3, 1, 0) if kind == "kernel" else value
            ok = _set_leaf(params, ("embedding", leaf), v)
            report["mapped" if ok else "shape_miss"] += 1
            continue

        if kind == "plif_w":
            ok = _set_leaf(params, path + ("w",), value)
        elif kind == "kernel":
            v = (
                value.transpose(2, 3, 1, 0) if value.ndim == 4 else value.T
            )
            ok = _set_leaf(params, path + ("kernel",), v)
        elif kind == "bias":
            ok = _set_leaf(params, path + ("bias",), value)
        elif kind == "bn_scale":
            ok = _set_leaf(params, path + ("scale",), value)
        elif kind == "bn_bias":
            ok = _set_leaf(params, path + ("bias",), value)
        elif kind == "bn_mean":
            ok = _set_leaf(stats, path + ("mean",), value)
        elif kind == "bn_var":
            ok = _set_leaf(stats, path + ("var",), value)
        else:
            ok = False
        if ok:
            report["mapped"] += 1
        else:
            report["unmapped"] += 1
            if verbose:
                print(f"  unmapped: {name} -> {'/'.join(path)} ({kind})")

    new_vars = dict(variables)
    new_vars["params"] = params
    if stats:
        new_vars["batch_stats"] = stats
    return new_vars, report
