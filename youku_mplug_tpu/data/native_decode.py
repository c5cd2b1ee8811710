"""ctypes binding for the native libav decoder (native/videodec.cpp).

Loads (building on demand if a toolchain + FFmpeg headers are present) the
C++ decoder that replaces the reference's decord dependency.  Falls back to
None when unavailable; callers then use the cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvideodec.so")

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not os.path.exists(_SO_PATH):
                subprocess.run(
                    ["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO_PATH)
            lib.vd_open.restype = ctypes.c_void_p
            lib.vd_open.argtypes = [ctypes.c_char_p]
            lib.vd_num_frames.restype = ctypes.c_long
            lib.vd_num_frames.argtypes = [ctypes.c_void_p]
            lib.vd_fps.restype = ctypes.c_double
            lib.vd_fps.argtypes = [ctypes.c_void_p]
            lib.vd_width.restype = ctypes.c_int
            lib.vd_width.argtypes = [ctypes.c_void_p]
            lib.vd_height.restype = ctypes.c_int
            lib.vd_height.argtypes = [ctypes.c_void_p]
            lib.vd_read_frames.restype = ctypes.c_int
            lib.vd_read_frames.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte)]
            lib.vd_close.argtypes = [ctypes.c_void_p]
            _lib = lib
        except Exception:
            _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


class NativeVideoReader:
    """One decoder handle per file (not thread-safe; one per worker)."""

    def __init__(self, path: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("native decoder unavailable")
        self._lib = lib
        self._h = lib.vd_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open video: {path}")

    def __len__(self) -> int:
        return int(self._lib.vd_num_frames(self._h))

    @property
    def fps(self) -> float:
        return float(self._lib.vd_fps(self._h))

    @property
    def shape(self):
        return (int(self._lib.vd_height(self._h)),
                int(self._lib.vd_width(self._h)))

    def get_batch(self, indices, width: int = 0, height: int = 0
                  ) -> np.ndarray:
        """-> (T, H, W, C) uint8 RGB."""
        n = len(indices)
        h, w = self.shape
        out_h = height or h
        out_w = width or w
        out = np.empty((n, out_h, out_w, 3), np.uint8)
        idx = (ctypes.c_long * n)(*[int(i) for i in indices])
        written = self._lib.vd_read_frames(
            self._h, idx, n, out_w, out_h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
        if written < n:
            raise IOError(f"decoded {written}/{n} frames")
        return out

    def close(self):
        if self._h:
            self._lib.vd_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
