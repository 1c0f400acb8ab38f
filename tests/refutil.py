"""Shared helper to import the reference package (/root/reference) with its
unavailable dependencies stubbed (loguru, torchvision, spikingjelly).

The reference's pure-torch/numpy paths (datasets, ANN models, transforms)
run fine on CPU once these three are faked; the stubs are inert — no test
exercises code paths that actually need them.
"""

import sys
import types

REF = "/root/reference"


def install_ref_stubs():
    if "loguru" not in sys.modules:
        fake = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None

        fake.logger = _L()
        sys.modules["loguru"] = fake
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(batched_nms=None, nms=None)
        sys.modules["torchvision"] = tv
    if "spikingjelly" not in sys.modules:
        sj = types.ModuleType("spikingjelly")
        ab = types.ModuleType("spikingjelly.activation_based")

        class _Any(types.ModuleType):
            def __getattr__(self, k):
                if k.startswith("__"):
                    raise AttributeError(k)
                return type(k, (), {"__init__": lambda self, *a, **kw: None})

        for name in ("neuron", "functional", "layer", "surrogate"):
            mod = _Any(f"spikingjelly.activation_based.{name}")
            setattr(ab, name, mod)
            sys.modules[f"spikingjelly.activation_based.{name}"] = mod
        sj.activation_based = ab
        sys.modules["spikingjelly"] = sj
        sys.modules["spikingjelly.activation_based"] = ab
    if "pycocotools" not in sys.modules:
        try:
            import pycocotools  # noqa: F401
        except ImportError:
            pc = types.ModuleType("pycocotools")
            coco = types.ModuleType("pycocotools.coco")
            coco.COCO = type("COCO", (), {})
            cocoeval = types.ModuleType("pycocotools.cocoeval")
            cocoeval.COCOeval = type("COCOeval", (), {})
            pc.coco, pc.cocoeval = coco, cocoeval
            sys.modules["pycocotools"] = pc
            sys.modules["pycocotools.coco"] = coco
            sys.modules["pycocotools.cocoeval"] = cocoeval
    if REF not in sys.path:
        sys.path.insert(0, REF)


def patch_ref_numpy_compat():
    """NumPy-2 NEP-50 shim: the reference's .dat parse_header returns the
    event size as a uint8 scalar; `python_int // uint8` now raises
    OverflowError. Cast header fields to python ints (no behavior change)."""
    import yolox.utils.psee_loader.io.dat_events_tools as dat

    if getattr(dat.parse_header, "_np2_patched", False):
        return
    orig = dat.parse_header

    def parse_header(f):
        start, ev_type, ev_size, size = orig(f)
        return int(start), int(ev_type), int(ev_size), size

    parse_header._np2_patched = True
    dat.parse_header = parse_header
