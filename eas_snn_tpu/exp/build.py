"""Experiment registry: load an Exp by file path or by name.

(reference: yolox/exp/build.py:10-42 and the meta-path finder in
yolox/exp/default/__init__.py:18-27 — here a plain directory scan of
``exps/default`` replaces the import hook.)
"""

from __future__ import annotations

import importlib.util
import os
import sys
from typing import Optional

__all__ = ["get_exp", "get_exp_by_file", "get_exp_by_name"]


def get_exp_by_file(exp_file: str):
    try:
        sys.path.insert(0, os.path.dirname(exp_file))
        spec = importlib.util.spec_from_file_location(
            os.path.basename(exp_file).split(".")[0], exp_file
        )
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module.Exp()
    finally:
        sys.path.pop(0)


def _exps_root() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    return os.path.join(os.path.dirname(os.path.dirname(here)), "exps")


def get_exp_by_name(exp_name: str):
    filename = exp_name.replace("-", "_") + ".py"
    path = os.path.join(_exps_root(), "default", filename)
    if not os.path.exists(path):
        raise FileNotFoundError(f"no experiment named '{exp_name}' ({path})")
    return get_exp_by_file(path)


def get_exp(exp_file: Optional[str] = None, exp_name: Optional[str] = None):
    assert exp_file is not None or exp_name is not None, \
        "please provide exp file or exp name"
    if exp_file is not None:
        return get_exp_by_file(exp_file)
    return get_exp_by_name(exp_name)
