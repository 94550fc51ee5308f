"""ctypes bindings for the native C++ data-loading runtime (loader.cpp).

Auto-builds the shared library on first use (g++, links system
libpng/libjpeg). `decode_images` is the drop-in decoder behind
data/blender.py::load_images — it replaces the reference's per-file imageio
loop + torch DataLoader worker processes with one threaded native pass.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libfsnerf_loader.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                   capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) <
            os.path.getmtime(os.path.join(_DIR, "loader.cpp"))):
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.fsnerf_probe_image.restype = ctypes.c_int
    lib.fsnerf_probe_image.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.fsnerf_decode_images.restype = ctypes.c_int
    lib.fsnerf_decode_images.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def probe_image(path: str):
    """(h, w, c) of an image file."""
    lib = get_lib()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.fsnerf_probe_image(path.encode(), ctypes.byref(h),
                                ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise IOError(f"cannot decode {path}")
    return h.value, w.value, c.value


def decode_images(paths: List[str], n_threads: int = 0,
                  channels: Optional[int] = None) -> np.ndarray:
    """Decode `paths` to [N, H, W, C] float32 in [0, 1] with a thread pool.

    All images must share H x W (standard for NeRF datasets); `channels`
    defaults to the first image's channel count (3 or 4), others are
    converted.
    """
    if not paths:
        raise ValueError("no images to decode")
    h, w, c = probe_image(paths[0])
    if channels is not None:
        c = channels
    n = len(paths)
    out = np.empty((n, h, w, c), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = get_lib().fsnerf_decode_images(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, n_threads)
    if rc != 0:
        raise IOError(f"failed decoding {paths[rc - 1]} "
                      f"(size/format mismatch with {paths[0]}: {h}x{w})")
    return out
