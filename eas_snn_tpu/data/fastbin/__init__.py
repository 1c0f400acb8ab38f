"""ctypes loader for the native event-binning core (see fastbin.cpp).

Same build pattern as evaluators/cocoeval: one g++ -O3 translation unit,
atomic rename, numpy fallback when no toolchain exists.
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
_SRC = os.path.join(_HERE, "fastbin.cpp")
# -march=native output is microarchitecture-specific: key the cache by
# machine so a shared filesystem across heterogeneous hosts never loads a
# .so built for a different CPU (SIGILL in the dataloader otherwise)
_SO = os.path.join(_HERE, f"_fastbin.{platform.machine()}.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_FAILED = False


def _build() -> None:
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        _SRC, "-o", tmp,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, _SO)


def load_native():
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
            u16 = np.ctypeslib.ndpointer(np.uint16, flags="C")
            u8 = np.ctypeslib.ndpointer(np.uint8, flags="C")
            i64 = np.ctypeslib.ndpointer(np.int64, flags="C")
            f32 = np.ctypeslib.ndpointer(np.float32, flags="C")
            lib.polarity_histogram.restype = None
            lib.polarity_histogram.argtypes = [
                ctypes.c_int64, u16, u16, u8,
                ctypes.c_int64, ctypes.c_int64, f32,
            ]
            lib.micro_sum.restype = None
            lib.micro_sum.argtypes = [
                ctypes.c_int64, i64, u16, u16, u8,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, f32,
            ]
            _LIB = lib
        except Exception:
            _FAILED = True
    return _LIB
