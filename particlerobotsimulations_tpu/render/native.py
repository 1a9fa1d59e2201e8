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


def _stale(so_path: str) -> bool:
    """True when the repo-local .so is older than its C++ sources."""
    try:
        so_mtime = os.path.getmtime(so_path)
    except OSError:
        return False  # missing: CDLL below reports that as OSError anyway
    src_dir = os.path.dirname(so_path)
    for src in ("raster.cpp", "mjpeg.cpp"):
        try:
            if os.path.getmtime(os.path.join(src_dir, src)) > so_mtime:
                return True
        except OSError:
            pass  # installed layout without sources: trust the binary
    return False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    for p in _SO_PATHS:
        if os.path.sep in p and _stale(os.path.abspath(p)):
            # built before its sources were last edited — behaviour could
            # silently diverge; prefer the numpy/PIL fallback and let the
            # user re-run `make -C native`
            continue
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
        try:
            lib.encode_jpeg.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int,
            ]
            lib.encode_jpeg.restype = ctypes.c_int
        except AttributeError:
            lib.encode_jpeg = None  # older build of the library
        _LIB = lib
        break
    return _LIB


def available() -> bool:
    return _load() is not None


def encode_jpeg(rgb: np.ndarray, quality: int = 90) -> bytes:
    """Baseline JPEG bytes for an (h, w, 3) uint8 RGB frame.

    Uses the native encoder (native/mjpeg.cpp); falls back to PIL when the
    library isn't built."""
    rgb = np.ascontiguousarray(rgb, np.uint8)
    h, w, c = rgb.shape
    assert c == 3
    lib = _load()
    if lib is not None and getattr(lib, "encode_jpeg", None) is not None:
        out = np.empty(w * h * 3 + 65536, np.uint8)
        n = lib.encode_jpeg(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w,
            h,
            quality,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            out.size,
        )
        if n > 0:
            return out[:n].tobytes()
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


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
