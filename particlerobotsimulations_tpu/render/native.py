"""ctypes loader for the native rasterizer (native/libpbot_render.so).

Falls back gracefully: ``available()`` is False when the library hasn't been
built (``make -C native``), and callers use the numpy path.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False

_SO_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libpbot_render.so"),
    "libpbot_render.so",
)


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _SO_PATHS:
        try:
            lib = ctypes.CDLL(os.path.abspath(p) if os.path.sep in p else p)
        except OSError:
            continue
        lib.splat_disks.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.splat_disks.restype = None
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    return _load() is not None


def splat_disks(img: np.ndarray, xs, ys, rs, cols) -> None:
    """img: (h, w, 3) uint8 C-contiguous, painted in place."""
    lib = _load()
    assert lib is not None
    h, w, _ = img.shape
    xs = np.ascontiguousarray(xs, np.float32)
    ys = np.ascontiguousarray(ys, np.float32)
    rs = np.ascontiguousarray(rs, np.float32)
    cols = np.ascontiguousarray(cols, np.uint8)
    assert img.flags.c_contiguous
    lib.splat_disks(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(xs),
    )
