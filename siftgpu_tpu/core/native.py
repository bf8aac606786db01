"""ctypes bindings for the native C++ loader (native/loader.cpp).

The runtime-around-the-compute-path native component (the reference's
DevIL/host-side plumbing is C++; ours is too).  Compiled on first use with
g++; every entry point falls back to the NumPy implementations in
`core.image` if the toolchain or the library is unavailable, so the pure
Python path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["available", "load_image", "load_batch", "write_binary_sift"]

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _build_and_load() -> Optional[ctypes.CDLL]:
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libsiftloader.so"))
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "loader.cpp"))
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", src,
                 "-o", so, "-lpthread"],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    lib.sift_load_image.restype = ctypes.c_int
    lib.sift_load_image.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_long, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.sift_load_batch.restype = ctypes.c_int
    lib.sift_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.sift_write_binary.restype = ctypes.c_int
    lib.sift_write_binary.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _TRIED = True
            _LIB = _build_and_load()
        return _LIB


def available() -> bool:
    return _lib() is not None


def load_image(path: str, maxd: int = 0) -> Optional[np.ndarray]:
    """Decode one PGM/PPM/BMP to grayscale float32 (None -> fall back)."""
    lib = _lib()
    if lib is None:
        return None
    cap = 64 * 1024 * 1024
    buf = np.empty(cap, np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.sift_load_image(
        path.encode(), maxd, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        cap, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


def load_batch(
    paths: List[str], height: int, width: int, maxd: int = 0, threads: int = 0
) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
    """Parallel decode of n files into a [n, H, W] float32 batch tensor
    (zero-padded / cropped to the slot).  Returns (batch, status) or
    (None, None) when the native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None, None
    n = len(paths)
    out = np.zeros((n, height, width), np.float32)
    status = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.sift_load_batch(
        arr, n, maxd, height, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), threads,
    )
    return out, status


def write_binary_sift(path: str, keys: np.ndarray, desc: np.ndarray) -> bool:
    lib = _lib()
    if lib is None:
        return False
    keys = np.ascontiguousarray(keys, np.float32)
    desc = np.ascontiguousarray(desc, np.uint8)
    rc = lib.sift_write_binary(
        path.encode(), len(keys),
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        desc.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return rc == 0
