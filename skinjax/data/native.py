"""ctypes bindings for the C++ input-staging library (native/staging.cc).

Compiles the shared object on first use (g++ is in the image) and caches it
next to the source; every entry point has a numpy fallback so the framework
works without a toolchain. See staging.cc for why this exists (GIL-free batch
gather + resize — the reference's DataLoader-worker role).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "staging.cc")
_SO = os.path.join(_NATIVE_DIR, "_staging.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC,
             "-lpthread"],
            check=True, capture_output=True, timeout=300,
        )
        return True
    except Exception as e:  # pragma: no cover - toolchain-dependent
        print(f"[native] build failed ({e}); using numpy fallback")
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_SO)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.skinjax_gather_u8.argtypes = [
        u8p, i64p, ctypes.c_int64, ctypes.c_int64, u8p, ctypes.c_int,
    ]
    lib.skinjax_resize_bilinear_u8.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def gather_u8(cache: np.ndarray, indices: np.ndarray,
              n_threads: int = 0) -> np.ndarray:
    """out[i] = cache[indices[i]] for uint8 item arrays (N, ...)."""
    cache = np.ascontiguousarray(cache)
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    lib = load()
    if lib is None:
        return cache[idx]
    n_threads = n_threads or min(8, os.cpu_count() or 1)
    item_bytes = int(np.prod(cache.shape[1:]))
    out = np.empty((len(idx), *cache.shape[1:]), dtype=np.uint8)
    lib.skinjax_gather_u8(
        _u8(cache), idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(idx), item_bytes, _u8(out), n_threads,
    )
    return out


def resize_bilinear_u8(src: np.ndarray, out_hw, n_threads: int = 0) -> np.ndarray:
    """Batch (N, H, W, 3) uint8 bilinear resize (cv2 half-pixel convention)."""
    src = np.ascontiguousarray(src)
    n, h, w, c = src.shape
    assert c == 3
    oh, ow = out_hw
    lib = load()
    if lib is None:  # numpy/cv2 fallback
        import cv2

        return np.stack([
            cv2.resize(im, (ow, oh), interpolation=cv2.INTER_LINEAR) for im in src
        ])
    n_threads = n_threads or min(8, os.cpu_count() or 1)
    out = np.empty((n, oh, ow, 3), dtype=np.uint8)
    lib.skinjax_resize_bilinear_u8(_u8(src), n, h, w, _u8(out), oh, ow, n_threads)
    return out
