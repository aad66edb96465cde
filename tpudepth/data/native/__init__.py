"""ctypes binding for the C++ batch decoder (compiled on first use, cached).

Falls back cleanly (returns None) when the toolchain or libjpeg/libpng dev
libraries are unavailable; callers then use the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "decoder.cpp")
_LIB_PATH = os.environ.get(
    "TPUDEPTH_NATIVE_LIB",
    os.path.join(os.path.expanduser("~"), ".cache", "tpudepth", "libtpudepth_decode.so"),
)
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", _LIB_PATH, "-ljpeg", "-lpng", "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native decoder; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _LIB_PATH
        if not os.path.exists(path) or os.path.getmtime(path) < os.path.getmtime(_SRC):
            path = _build()
        if path is None or not os.path.exists(path):
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            return None
        lib.tpudepth_decode_batch.restype = ctypes.c_int
        lib.tpudepth_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.tpudepth_decode_batch_raw.restype = ctypes.c_int
        lib.tpudepth_decode_batch_raw.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.tpudepth_decode_batch_raw_scaled.restype = ctypes.c_int
        lib.tpudepth_decode_batch_raw_scaled.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.tpudepth_probe.restype = ctypes.c_int
        lib.tpudepth_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def probe(buf: bytes) -> Optional[Tuple[int, int, int, int]]:
    """(h, w, channels, bit_depth) of an encoded image, or None."""
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    bd = ctypes.c_int()
    rc = lib.tpudepth_probe(buf, len(buf), ctypes.byref(h), ctypes.byref(w),
                            ctypes.byref(c), ctypes.byref(bd))
    if rc != 0:
        return None
    return h.value, w.value, c.value, bd.value


def decode_batch(
    bufs: List[bytes], h: int, w: int, c: int, nthreads: int = 0
) -> Optional[np.ndarray]:
    """Decode encoded JPEG/PNG buffers into float32 [n, h, w, c]; None on any
    failure (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(bufs)
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 8)
    out = np.empty((n, h, w, c), dtype=np.float32)
    arr_bufs = (ctypes.c_char_p * n)(*bufs)
    arr_sizes = (ctypes.c_size_t * n)(*[len(b) for b in bufs])
    rc = lib.tpudepth_decode_batch(
        arr_bufs, arr_sizes, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h, w, c, nthreads,
    )
    if rc != 0:
        return None
    return out


def decode_batch_raw(
    bufs: List[bytes], h: int, w: int, c: int, bit_depth: int,
    nthreads: int = 0, scale_denom: int = 1
) -> Optional[np.ndarray]:
    """Decode into raw integer pixels: uint8 [n,h,w,c] for 8-bit sources,
    uint16 for 16-bit PNG. Normalization (/255, /256) is the device's job —
    this keeps the single-core host path to a pure decode + memcpy.

    ``scale_denom`` in {1,2,4,8}: (h, w) are the OUTPUT dims, files must be
    (h*s, w*s). JPEGs decode directly at 1/s via libjpeg DCT scaling
    (~s^2 cheaper — the single-core host's lever for half-res configs);
    PNGs box-average s x s blocks."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(bufs)
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 8)
    dtype = np.uint16 if bit_depth == 16 else np.uint8
    out = np.empty((n, h, w, c), dtype=dtype)
    arr_bufs = (ctypes.c_char_p * n)(*bufs)
    arr_sizes = (ctypes.c_size_t * n)(*[len(b) for b in bufs])
    rc = lib.tpudepth_decode_batch_raw_scaled(
        arr_bufs, arr_sizes, n, out.ctypes.data_as(ctypes.c_void_p),
        h, w, c, bit_depth, scale_denom, nthreads,
    )
    if rc != 0:
        return None
    return out
