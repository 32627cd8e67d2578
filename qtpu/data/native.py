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
    # Compile to a temp path and atomically replace: never destroy a
    # working (if stale) library unless the rebuild SUCCEEDED — a host
    # without g++ must keep whatever .so it has.  os.replace also gives
    # the new build a fresh inode, so a later dlopen cannot return an
    # already-mapped stale image (g++ -o in place would truncate the
    # same inode).
    tmp = f"{_SO}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-shared",
             "-fPIC", "-o", tmp,
             _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return True
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


_ABI_VERSION = 2        # must match qtpu_native_version() in preprocess.cpp


def load_native() -> Optional[ctypes.CDLL]:
    """The native library, building it on first call; None if unavailable.

    A cached ``.so`` from an older source revision (missing newer symbols)
    is detected via ``qtpu_native_version`` and rebuilt in place.
    """
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and os.path.exists(_SRC):
            if not _build():
                return None
        for attempt in range(2):
            try:
                lib = ctypes.CDLL(_SO)
                lib.qtpu_native_version.restype = ctypes.c_int
                if lib.qtpu_native_version() >= _ABI_VERSION:
                    break
            except (OSError, AttributeError):
                pass
            # stale or unloadable build: rebuild once from source
            if attempt or not os.path.exists(_SRC) or not _build():
                return None
        else:
            return None
        lib.qtpu_preprocess_quantize.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_float,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_int]
        lib.qtpu_preprocess_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int]
        lib.qtpu_pack_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int]
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


# Below this total size the per-call thread spawn costs more than the copy
# saves (measured: u8 B=128 = 19 MB ran 0.87x vs np.stack —
# scripts/host_pack_bench.py, bench_receipts/host_pack_r5.jsonl).
_PACK_NATIVE_MIN_BYTES = 32 << 20


def pack_batch(images, pad_to: Optional[int] = None, threads: int = 0,
               dtype=None, shape=None) -> np.ndarray:
    """Gather equally-shaped images into one contiguous (B, ...) batch.

    Replaces the serving scheduler's per-round stack-then-concatenate with
    a SINGLE copy into the zero-padded bucket buffer.  ``pad_to``:
    allocate that many rows, zero-filling the tail (the engine's bucket
    padding).  ``dtype``/``shape``: the expected per-image dtype and shape
    (default: the first image's) — every image must match the shape
    EXACTLY (``np.stack`` semantics: no silent broadcasting), and dtype
    mismatches are cast only when numpy's "same_kind" rule allows (f64→f32
    yes; f32→u8 raises — a float image packed into a uint8 wire batch is
    data corruption, not a cast).  Only the padding tail is zeroed (a full
    zeros() pass over a 77 MB buffer costs ~13 ms on this ~6 GB/s host —
    the same order as the copy the function exists to save).

    Honest measurement (scripts/host_pack_bench.py, receipt
    host_pack_r5.jsonl): on this DRAM-bandwidth-bound host the
    multithreaded native gather is only 1.04x np.stack for a 77 MB f32
    round and LOSES at small sizes to its own thread-spawn cost — so the
    native path engages only above ``_PACK_NATIVE_MIN_BYTES`` and the
    claimed win is the removed second copy + tail allocation, not memcpy
    parallelism.
    """
    n = len(images)
    if n == 0:
        raise ValueError("pack_batch needs at least one image")
    first = np.asarray(images[0])
    dtype = np.dtype(dtype) if dtype is not None else first.dtype
    shape = tuple(shape) if shape is not None else first.shape
    rows = n if pad_to is None else int(pad_to)
    if rows < n:
        raise ValueError(f"pad_to={pad_to} < batch size {n}")

    def checked(im) -> np.ndarray:
        a = np.asarray(im)
        if a.shape != shape:
            raise ValueError(
                f"pack_batch: image shape {a.shape} != batch shape {shape}")
        if a.dtype != dtype:
            if not np.can_cast(a.dtype, dtype, casting="same_kind"):
                raise ValueError(
                    f"pack_batch: refusing unsafe cast {a.dtype} -> {dtype}")
            a = a.astype(dtype)
        return a

    out = np.empty((rows, *shape), dtype)
    if rows > n:
        out[n:] = 0                      # zero only the padding tail
    lib = (load_native()
           if n * int(np.prod(shape)) * dtype.itemsize
           >= _PACK_NATIVE_MIN_BYTES else None)
    if lib is not None:
        # keep refs alive through the call
        srcs = [np.ascontiguousarray(checked(im)) for im in images]
        ptrs = (ctypes.c_void_p * n)(
            *[a.ctypes.data_as(ctypes.c_void_p).value for a in srcs])
        threads = threads or min(os.cpu_count() or 1, 8)
        lib.qtpu_pack_batch(ptrs, n, srcs[0].nbytes, _as_c(out), threads)
        return out
    for i, im in enumerate(images):
        out[i] = checked(im)
    return out


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
