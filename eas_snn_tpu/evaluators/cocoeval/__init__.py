"""ctypes loader/JIT builder for the native COCO matcher.

(reference: yolox/layers/jit_ops.py:14-138 — deepspeed-style on-demand
compile with a master-rank lock; here a single ``g++ -O3 -shared`` of one
translation unit, cached next to the source.)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

import platform

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cocoeval.cpp")
# arch-keyed: -march=native .so must not be shared across host types
_SO = os.path.join(_HERE, f"_cocoeval.{platform.machine()}.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> None:
    # compile to a unique temp name and rename atomically so concurrent
    # builders (multi-process eval) never load a half-written .so
    # (replaces the reference's wait_for_the_master barrier,
    # yolox/layers/jit_ops.py:85-87)
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _SO)


def load_native():
    """Return the CDLL with ``coco_match_category``, building on first use;
    None if no toolchain is available (numpy fallback takes over)."""
    global _LIB, _FAILED
    if _LIB is not None or _FAILED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        try:
            if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                _build()
            lib = ctypes.CDLL(_SO)
            fn = lib.coco_match_category
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                np.ctypeslib.ndpointer(np.uint8, flags="C"),
                np.ctypeslib.ndpointer(np.int64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                np.ctypeslib.ndpointer(np.float64, flags="C"),
                ctypes.c_int64,
                ctypes.c_double, ctypes.c_double, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.uint8, flags="C"),
                np.ctypeslib.ndpointer(np.uint8, flags="C"),
                np.ctypeslib.ndpointer(np.int32, flags="C"),
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
            _LIB = None
    return _LIB
