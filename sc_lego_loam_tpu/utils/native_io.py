"""ctypes bindings for the native IO runtime (native/scloam_io.cpp).

Builds the shared library on first use (g++, cached next to the source).
Falls back cleanly: callers can check ``available()`` and use the pure-
python loaders in utils/mulran.py instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO = os.path.join(_NATIVE_DIR, "libscloam_io.so")
_SRC = os.path.join(_NATIVE_DIR, "scloam_io.cpp")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-Wall", "-pthread",
             "-shared", "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        lib.sl_open.restype = ctypes.c_void_p
        lib.sl_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                                ctypes.c_int, ctypes.c_int]
        lib.sl_next.restype = ctypes.c_int64
        lib.sl_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_uint8)]
        lib.sl_close.argtypes = [ctypes.c_void_p]
        lib.sl_write_pcd.restype = ctypes.c_int
        lib.sl_write_pcd.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
        lib.sl_write_ply.restype = ctypes.c_int
        lib.sl_write_ply.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_int64]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


class NativeScanLoader:
    """Background-threaded prefetching loader over raw .bin scan files."""

    def __init__(self, files: list[str], max_points: int,
                 n_threads: int = 2, prefetch_depth: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._max_points = max_points
        blob = b"".join(f.encode() + b"\x00" for f in files)
        self._h = lib.sl_open(blob, len(files), max_points, n_threads,
                              prefetch_depth)
        self._n = len(files)
        self._xyz = np.zeros((max_points, 3), np.float32)
        self._mask = np.zeros((max_points,), np.uint8)

    def __iter__(self):
        return self

    def __next__(self):
        n = self._lib.sl_next(
            self._h,
            self._xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if n < 0:
            raise StopIteration
        return self._xyz.copy(), self._mask.astype(bool)

    def close(self):
        if self._h:
            self._lib.sl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_pcd(path: str, points: np.ndarray) -> None:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    r = lib.sl_write_pcd(path.encode(),
                         pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         len(pts))
    if r != 0:
        raise IOError(f"pcd write failed: {path}")


def write_ply(path: str, points: np.ndarray) -> None:
    lib = _load()
    pts = np.ascontiguousarray(points, np.float32)
    if lib is None:
        raise RuntimeError("native IO library unavailable")
    r = lib.sl_write_ply(path.encode(),
                         pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                         len(pts))
    if r != 0:
        raise IOError(f"ply write failed: {path}")
