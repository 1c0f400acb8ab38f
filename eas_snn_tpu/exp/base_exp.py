"""Code-as-config experiment system.

Mirrors the reference's Exp contract (reference: yolox/exp/base_exp.py:16-90):
an experiment is a python class holding every knob; the CLI overrides fields
with positional ``key value`` pairs through type-coercing ``merge``; concrete
factories (model / dataset / loader / optimizer / evaluator) are methods.
"""

from __future__ import annotations

import ast
import pprint
from abc import ABC, abstractmethod
from typing import Any, Dict, List, Sequence


class BaseExp(ABC):
    seed: Any = None
    output_dir: str = "./outputs"
    print_interval: int = 100
    eval_interval: int = 10
    dataset = None

    def merge(self, cfg_list: Sequence[str]):
        """Apply CLI 'key value' overrides with source-type coercion
        (reference base_exp.py:67-90)."""
        assert len(cfg_list) % 2 == 0, "override list must be key-value pairs"
        for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
            if k.startswith("--"):
                k = k[2:]
            assert hasattr(self, k), f"unknown config key '{k}'"
            src_value = getattr(self, k)
            src_type = type(src_value)
            if src_value is not None and src_type != str:
                try:
                    v = ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    pass
            setattr(self, k, v)
        return self

    def __repr__(self) -> str:
        items = {
            k: v
            for k, v in vars(self).items()
            if not k.startswith("_") and not callable(v)
        }
        cls_items = {
            k: getattr(self, k)
            for k in dir(type(self))
            if not k.startswith("_")
            and not callable(getattr(type(self), k, None))
            and k not in items
        }
        return pprint.pformat({**cls_items, **items})

    @abstractmethod
    def get_model(self):
        ...

    @abstractmethod
    def get_dataset(self, **kwargs):
        ...

    @abstractmethod
    def get_evaluator(self, **kwargs):
        ...
