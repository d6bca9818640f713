"""ctypes loader for the native IO helpers (native/colmap_io.cpp).

The shared object is built on first use with g++ into native/build/ and
memoized; every entry point degrades to the pure-Python implementation when
the toolchain or build is unavailable, so the native layer is a pure
accelerator, never a dependency."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "colmap_io.cpp")
_SO = os.path.join(_ROOT, "native", "build", "libcolmap_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
                       check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                       < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.points3d_parse.restype = ctypes.c_longlong
        lib.points3d_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_ubyte),
            ctypes.POINTER(ctypes.c_double)]
        lib.images_meta_parse.restype = ctypes.c_longlong
        lib.images_meta_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def points3d_parse_native(data: bytes):
    """Parse a points3D.bin buffer natively. Returns (xyz, rgb, errors) or
    None if the native library is unavailable or the buffer is malformed."""
    import numpy as np
    lib = get_lib()
    if lib is None or len(data) < 8:
        return None
    n = int(np.frombuffer(data[:8], np.uint64)[0])
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    err = np.empty((n, 1), np.float64)
    got = lib.points3d_parse(
        data, len(data),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        err.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    if got != n:
        return None
    return xyz, rgb, err
