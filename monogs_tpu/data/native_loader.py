"""ctypes wrapper for the native prefetching frame loader.

The C++ library (native/frame_loader.cpp) decodes JPEG/PNG frames in a
worker-thread pool ahead of the consumer — the TPU-native equivalent of the
reference's C++ `lycon` loader, plus overlap of disk/decode with device
compute. Falls back transparently (returns None from make_loader) when the
shared library hasn't been built; datasets then use cv2.

Build with: native/build.sh
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libframeloader.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.fl_create.restype = ctypes.c_void_p
        lib.fl_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.fl_frame_size.restype = ctypes.c_int
        lib.fl_frame_size.argtypes = [ctypes.c_void_p, ctypes.c_int] + [
            ctypes.POINTER(ctypes.c_int)
        ] * 4
        lib.fl_get.restype = ctypes.c_int
        lib.fl_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ushort),
        ]
        lib.fl_destroy.argtypes = [ctypes.c_void_p]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


class NativeFrameLoader:
    """Prefetching decoder over (color_paths, optional depth_paths)."""

    def __init__(self, color_paths, depth_paths=None, n_threads=4, window=8):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("libframeloader.so not built (native/build.sh)")
        self._lib = lib
        n = len(color_paths)
        c_arr = (ctypes.c_char_p * n)(
            *[p.encode() for p in color_paths]
        )
        if depth_paths is not None:
            d_arr = (ctypes.c_char_p * n)(
                *[(p or "").encode() for p in depth_paths]
            )
        else:
            d_arr = None
        self._h = lib.fl_create(c_arr, d_arr, n, n_threads, window)
        self._n = n

    def __len__(self):
        return self._n

    def get(self, idx):
        """Returns (rgb uint8 [H,W,3], depth uint16 [H,W] or None)."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        dw = ctypes.c_int()
        dh = ctypes.c_int()
        rc = self._lib.fl_frame_size(
            self._h, idx, ctypes.byref(w), ctypes.byref(h),
            ctypes.byref(dw), ctypes.byref(dh),
        )
        if rc != 0:
            raise IOError(f"frame {idx} failed to decode")
        rgb = np.empty((h.value, w.value, 3), np.uint8)
        depth = (
            np.empty((dh.value, dw.value), np.uint16)
            if dw.value > 0
            else None
        )
        rc = self._lib.fl_get(
            self._h, idx,
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            depth.ctypes.data_as(ctypes.POINTER(ctypes.c_ushort))
            if depth is not None
            else None,
        )
        if rc != 0:
            raise IOError(f"frame {idx} failed to decode")
        return rgb, depth

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.fl_destroy(self._h)
            self._h = None


def make_loader(color_paths, depth_paths=None, n_threads=4, window=8):
    """Best-effort constructor: None when the native lib is unavailable."""
    try:
        return NativeFrameLoader(color_paths, depth_paths, n_threads, window)
    except (RuntimeError, OSError):
        return None
