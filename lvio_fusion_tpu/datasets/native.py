"""ctypes bindings for the native C++ data loader (native/dataloader.cpp).

Compiles the shared library on first use (cached); every entry point has
a pure-Python fallback (numpy / PIL) so the package works without a
toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdataloader.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        # unconditional make: a no-op when the library is fresh, a
        # rebuild when a source is newer than a stale local .so
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.lvio_load_velodyne.restype = ctypes.c_int
        lib.lvio_load_png_gray.restype = ctypes.c_int
        lib.lvio_dct_encode.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library (None when no toolchain is available)."""
    return _load()


def load_velodyne(path: str, max_points: int = 150000) -> np.ndarray:
    """KITTI velodyne .bin -> (N, 4) float32 [x, y, z, intensity]."""
    lib = _load()
    if lib is not None:
        out = np.empty((max_points, 4), np.float32)
        n = lib.lvio_load_velodyne(
            path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_points)
        if n >= 0:
            return out[:n]
    # fallback
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)[:max_points]


def load_png_gray(path: str, max_h: int = 2048,
                  max_w: int = 4096) -> np.ndarray:
    """Grayscale PNG -> (H, W) uint8."""
    lib = _load()
    if lib is not None:
        out = np.empty((max_h, max_w), np.uint8)
        h = ctypes.c_int()
        w = ctypes.c_int()
        rc = lib.lvio_load_png_gray(
            path.encode(),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            max_h, max_w, ctypes.byref(h), ctypes.byref(w))
        if rc == 0:
            return out[:h.value, :w.value].copy()
    from PIL import Image
    return np.asarray(Image.open(path).convert("L"))


def load_velodyne_batch(paths: List[str],
                        max_points: int = 150000) -> List[np.ndarray]:
    """Threaded batch scan load (prefetch)."""
    lib = _load()
    if lib is None:
        return [load_velodyne(p, max_points) for p in paths]
    n = len(paths)
    out = np.empty((n, max_points, 4), np.float32)
    counts = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.lvio_load_velodyne_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_points, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return [out[i, :max(counts[i], 0)].copy() for i in range(n)]


def load_png_gray_batch(paths: List[str], max_h: int = 512,
                        max_w: int = 2048) -> List[Optional[np.ndarray]]:
    lib = _load()
    if lib is None:
        return [load_png_gray(p, max_h, max_w) for p in paths]
    n = len(paths)
    out = np.empty((n, max_h, max_w), np.uint8)
    hs = np.empty(n, np.int32)
    ws = np.empty(n, np.int32)
    status = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.lvio_load_png_gray_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        max_h, max_w, hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return [out[i, :hs[i], :ws[i]].copy() if status[i] == 0 else None
            for i in range(n)]
