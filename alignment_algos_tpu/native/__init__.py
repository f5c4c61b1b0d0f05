"""Native helpers: libm-exact elementwise math (see exactmath.c).

The shared object is built on first use with the system compiler and cached
next to the source.  Falls back to numpy (1-ulp differences possible) when
no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "exactmath.c")
_SO = os.path.join(_DIR, "_exactmath.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        try:
            subprocess.run(["cc", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC,
                            "-lm"], check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            return None
    try:
        _lib = ctypes.CDLL(_SO)
    except OSError:
        _lib = None
    return _lib


def _vec_f32(fn_name: str, np_fallback):
    def apply(x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float32)
        lib = _load()
        if lib is None:
            return np_fallback(x).astype(np.float32)
        y = np.empty_like(x)
        getattr(lib, fn_name)(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_long(x.size))
        return y
    return apply


def _vec_f64(fn_name: str, np_fallback):
    def apply(x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, dtype=np.float64)
        lib = _load()
        if lib is None:
            return np_fallback(x)
        y = np.empty_like(x)
        getattr(lib, fn_name)(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            y.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_long(x.size))
        return y
    return apply


expf = _vec_f32("v_expf", np.exp)
logf = _vec_f32("v_logf", np.log)
sqrtf = _vec_f32("v_sqrtf", np.sqrt)
erfcf = _vec_f32("v_erfcf", lambda x: np.vectorize(__import__("math").erfc)(x))
exp64 = _vec_f64("v_exp", np.exp)
log64 = _vec_f64("v_log", np.log)
erfc64 = _vec_f64("v_erfc", lambda x: np.vectorize(__import__("math").erfc)(x))
