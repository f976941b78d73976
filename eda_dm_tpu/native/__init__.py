"""Native (C++) runtime components, ctypes-bound.

Currently: the parallel PNG writer behind ``eval.io.save_images``
(imgio.cpp).  The shared library is compiled on demand from the vendored
source with the system toolchain and cached next to it; everything here
degrades gracefully (callers fall back to PIL when no toolchain or libpng
is present).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imgio.cpp")
_LIB = os.path.join(_DIR, "libedmimgio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O2", "-shared", "-fPIC", _SRC, "-lpng", "-lz",
           "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_imgio() -> Optional[ctypes.CDLL]:
    """The imgio library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.edm_write_png_batch.restype = ctypes.c_int
        lib.edm_write_png_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),     # data
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),    # paths
            ctypes.c_int, ctypes.c_int,         # n_threads, compress_level
        ]
        _lib = lib
        return _lib


def write_png_batch(images_u8: np.ndarray, paths, n_threads: int = 0,
                    compress_level: int = 6) -> bool:
    """Write a (N, H, W, C) uint8 batch as PNGs via the native writer.

    Returns False (having written nothing or partially) when the native
    library is unavailable or any image fails — callers should then fall
    back to the PIL path.
    """
    lib = load_imgio()
    if lib is None:
        return False
    arr = np.ascontiguousarray(images_u8)
    if arr.ndim != 4 or arr.dtype != np.uint8:
        raise ValueError("expected (N, H, W, C) uint8")
    n, h, w, c = arr.shape
    if len(paths) != n:
        raise ValueError("paths/images length mismatch")
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)
    c_paths = (ctypes.c_char_p * n)(
        *[os.fsencode(p) for p in paths])
    failures = lib.edm_write_png_batch(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, h, w, c, c_paths, n_threads, compress_level)
    return failures == 0
