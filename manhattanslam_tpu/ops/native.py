"""ctypes bindings to the native host runtime (native/libmslam.so).

The TPU owns all dense math; the few inherently-sequential host loops
(the PEAC AHC merge heap) live in C++ — ~100 us instead of ~1.3 s in
Python.  Falls back to the pure-Python implementation when the library
is absent (it is auto-built with `make -C native` when a toolchain is
available).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libmslam.so"))

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ahc_merge.restype = ctypes.c_int
        lib.ahc_merge.argtypes = [
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),  # n
            ctypes.POINTER(ctypes.c_double),  # s1
            ctypes.POINTER(ctypes.c_double),  # s2
            ctypes.POINTER(ctypes.c_double),  # normal
            ctypes.POINTER(ctypes.c_double),  # mean
            ctypes.POINTER(ctypes.c_uint8),   # valid
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int32),   # out labels
        ]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def have_native() -> bool:
    return bool(_load())


def ahc_merge_native(
    stats: dict, grid_shape: tuple[int, int], min_support: int,
    angle_cos: float | None = None,
) -> np.ndarray | None:
    """C++ AHC merge; returns labels (B,) int32 or None if unavailable.

    angle_cos=None selects the dynamic T_ang(INIT, z) gate in the C++
    (sentinel -1); a float forces a fixed normal gate."""
    if angle_cos is None:
        angle_cos = -1.0
    lib = _load()
    if not lib:
        return None
    bh, bw = grid_shape
    B = bh * bw

    def as64(a, shape):
        out = np.ascontiguousarray(np.asarray(a, dtype=np.float64)).reshape(shape)
        return out

    n = as64(stats["n"], (B,))
    s1 = as64(stats["s1"], (B, 3))
    s2 = as64(stats["s2"], (B, 3, 3))
    normal = as64(stats["normal"], (B, 3))
    mean = as64(stats["mean"], (B, 3))
    valid = np.ascontiguousarray(stats["valid"].astype(np.uint8))
    labels = np.empty(B, np.int32)

    def p(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.ahc_merge(
        bh, bw,
        p(n, ctypes.c_double), p(s1, ctypes.c_double), p(s2, ctypes.c_double),
        p(normal, ctypes.c_double), p(mean, ctypes.c_double),
        p(valid, ctypes.c_uint8),
        ctypes.c_double(angle_cos), ctypes.c_double(min_support),
        p(labels, ctypes.c_int32),
    )
    return labels
