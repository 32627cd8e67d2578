"""ctypes bindings for the native host preprocessing library.

Builds ``native/preprocess.cpp`` with g++ on first use (cached under
``native/``); falls back to a numpy implementation when no compiler is
available, so the API is always usable.  See native/preprocess.cpp for the
rationale (host-side fused normalize+quantize → int8 ingest).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "preprocess.cpp")
_SO = os.path.join(_REPO, "native", "libqtpu_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
             "-fPIC", "-o", _SO,
             _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and os.path.exists(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.qtpu_preprocess_quantize.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_float,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int]
        lib.qtpu_preprocess_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int]
        lib.qtpu_native_version.restype = ctypes.c_int
        _lib = lib
        return _lib


def _as_c(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def preprocess_quantize(images_u8: np.ndarray, mean, std, scale: float,
                        zp_signed: int, threads: int = 0) -> np.ndarray:
    """uint8 (N,H,W,C) → int8 codes on the stem's affine grid.

    Numerically identical to ``qops.quantize_act((x/255 - mean)/std, ...)``
    (round-half-to-even).  Uses the native lib when available, numpy otherwise.
    """
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    n, h, w, c = images_u8.shape
    mean = np.ascontiguousarray(mean, dtype=np.float32).reshape(c)
    std = np.ascontiguousarray(std, dtype=np.float32).reshape(c)
    lib = load_native()
    if lib is not None:
        out = np.empty(images_u8.shape, np.int8)
        threads = threads or min(os.cpu_count() or 1, 8)
        lib.qtpu_preprocess_quantize(
            _as_c(images_u8), n, h, w, c, _as_c(mean), _as_c(std),
            ctypes.c_float(scale), ctypes.c_int32(zp_signed), _as_c(out),
            threads)
        return out
    x = (images_u8.astype(np.float32) / 255.0 - mean) / std
    q = np.round(x / scale + (zp_signed + 128))
    return (np.clip(q, 0, 255) - 128).astype(np.int8)


def preprocess_f32(images_u8: np.ndarray, mean, std,
                   threads: int = 0) -> np.ndarray:
    """uint8 (N,H,W,C) → normalized float32."""
    images_u8 = np.ascontiguousarray(images_u8, dtype=np.uint8)
    n, h, w, c = images_u8.shape
    mean = np.ascontiguousarray(mean, dtype=np.float32).reshape(c)
    std = np.ascontiguousarray(std, dtype=np.float32).reshape(c)
    lib = load_native()
    if lib is not None:
        out = np.empty(images_u8.shape, np.float32)
        threads = threads or min(os.cpu_count() or 1, 8)
        lib.qtpu_preprocess_f32(_as_c(images_u8), n, h, w, c, _as_c(mean),
                                _as_c(std), _as_c(out), threads)
        return out
    return ((images_u8.astype(np.float32) / 255.0 - mean) / std).astype(
        np.float32)
