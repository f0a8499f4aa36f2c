"""ctypes bindings for the native C++ image pipeline.

Compiled on first use with g++ (cached next to the source); everything
degrades gracefully to the PIL path when the toolchain or libjpeg/libpng
are absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

_SRC = Path(__file__).parent / "image_pipeline.cc"
_SO = Path(__file__).parent / "_image_pipeline.so"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           str(_SRC), "-o", str(_SO), "-ljpeg", "-lpng", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
            lib.decode_image.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int]
            lib.decode_image.restype = ctypes.c_int
            lib.decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int]
            lib.decode_batch.restype = ctypes.c_int
            try:
                # added after the first release of the .so; a stale
                # binary simply reports the checked API as unavailable
                lib.decode_batch2.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8)]
                lib.decode_batch2.restype = ctypes.c_int
                lib._has_batch2 = True
            except AttributeError:
                lib._has_batch2 = False
            try:
                lib.decode_batch3.argtypes = [
                    ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
                    ctypes.c_int, ctypes.c_int,
                    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
                lib.decode_batch3.restype = ctypes.c_int
                lib.decode_image_opts.argtypes = [
                    ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                    ctypes.c_int, ctypes.c_int, ctypes.c_int]
                lib.decode_image_opts.restype = ctypes.c_int
                lib._has_batch3 = True
            except AttributeError:
                lib._has_batch3 = False
            _LIB = lib
        except OSError:
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _fast_default() -> bool:
    """DCT-scaled JPEG decode on the hot path: libjpeg runs its inverse
    DCT at the smallest M/8 scale covering the target (2-4x cheaper on
    downscales; for 256->224 the bilinear pass vanishes entirely at
    M=7). Output differs from the full-decode+bilinear path by a few u8
    LSB — the same class of approximation as PIL's Image.draft().
    MMB_FAST_DECODE=0 restores the exact path."""
    return os.environ.get("MMB_FAST_DECODE", "1") == "1"


def _flags(fast: Optional[bool]) -> int:
    return 1 if ((_fast_default() if fast is None else fast)) else 0


def decode_image(path: str, size: int = 224,
                 fast: Optional[bool] = None) -> Optional[np.ndarray]:
    """Decode + resize one image to [size, size, 3] uint8; None on failure."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.uint8)
    if getattr(lib, "_has_batch3", False):
        rc = lib.decode_image_opts(
            str(path).encode(), out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)), size, size, _flags(fast))
    else:
        rc = lib.decode_image(
            str(path).encode(), out.ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)), size, size)
    return out if rc == 0 else None


def decode_batch(paths: List[str], size: int = 224, n_threads: int = 0,
                 fast: Optional[bool] = None) -> Optional[np.ndarray]:
    """Decode + resize a batch -> [N, size, size, 3] uint8 (failed slots
    zero-filled); None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 4)
    if getattr(lib, "_has_batch3", False):
        lib.decode_batch3(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size, size, n_threads, None, _flags(fast))
    else:
        lib.decode_batch(arr, n,
                         out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         size, size, n_threads)
    return out


def decode_batch_checked(paths: List[str], size: int = 224,
                         n_threads: int = 0,
                         fast: Optional[bool] = None
                         ) -> Optional[tuple]:
    """Like decode_batch, but also returns a per-slot success mask
    ([N] uint8, 1 = decoded) so callers can route failed slots through a
    fallback decoder instead of silently consuming zero-filled frames.
    None if the native library is unavailable."""
    lib = _load()
    if lib is None or not getattr(lib, "_has_batch2", False):
        return None
    n = len(paths)
    out = np.empty((n, size, size, 3), np.uint8)
    ok = np.empty((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 4)
    if getattr(lib, "_has_batch3", False):
        lib.decode_batch3(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size, size, n_threads,
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _flags(fast))
    else:
        lib.decode_batch2(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size, size, n_threads,
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out, ok
