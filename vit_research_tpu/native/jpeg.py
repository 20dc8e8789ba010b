"""ctypes bindings for the native JPEG decoder (jpeg_fast.c).

Compiles the shared library on first use (cc -O3 -ljpeg), caches it next
to the source, and degrades gracefully (``is_available() -> False``) when
no compiler or libjpeg is present — callers fall back to PIL.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "jpeg_fast.c")
_SO = os.path.join(_HERE, "_jpeg_fast.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    for cc in ("cc", "gcc", "g++"):
        try:
            result = subprocess.run(
                [cc, "-O3", "-shared", "-fPIC", _SRC, "-ljpeg", "-o", _SO],
                capture_output=True, timeout=120)
            if result.returncode == 0:
                return True
        except (OSError, subprocess.TimeoutExpired):
            continue
    return False


def _get_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        # A prebuilt .so shipped without the .c source must still load:
        # treat a missing source as "not stale" instead of raising.
        try:
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        except OSError:
            stale = not os.path.exists(_SO)
        if stale:
            # A failed rebuild (e.g. no compiler in the image) must not
            # discard a prebuilt .so that still loads — fall through to
            # the CDLL attempt whenever one exists on disk.
            if not _build() and not os.path.exists(_SO):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.decode_resize.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p]
        lib.decode_resize.restype = ctypes.c_int
        lib.decode_files.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p]
        lib.decode_files.restype = ctypes.c_int
        _lib = lib
    return _lib


def is_available() -> bool:
    return _get_lib() is not None


def decode_file(path: str, target_hw: tuple) -> np.ndarray:
    """Decode one JPEG file to exactly (H, W, 3) uint8 RGB."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native jpeg decoder unavailable")
    h, w = target_hw
    with open(path, "rb") as f:
        data = f.read()
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.decode_resize(data, len(data), h, w,
                           out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        raise ValueError(f"jpeg decode failed ({rc}): {path}")
    return out


def decode_batch(paths, target_hw: tuple, out: np.ndarray | None = None,
                 num_workers: int = 1) -> np.ndarray:
    """Decode many files to (N, H, W, 3) uint8.

    The C call releases the GIL, so ``num_workers > 1`` genuinely
    parallelizes across host cores (each worker decodes a contiguous
    slice with one C call)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError("native jpeg decoder unavailable")
    h, w = target_hw
    n = len(paths)
    if out is None:
        out = np.empty((n, h, w, 3), np.uint8)
    elif (not out.flags["C_CONTIGUOUS"] or out.dtype != np.uint8
          or out.shape != (n, h, w, 3)):
        # The C decoder writes n*h*w*3 bytes through a raw pointer; a
        # strided view / wrong dtype / wrong shape would silently
        # corrupt the caller's memory.
        raise ValueError(
            f"out must be C-contiguous uint8 of shape {(n, h, w, 3)}; "
            f"got {out.dtype} {out.shape} "
            f"contiguous={out.flags['C_CONTIGUOUS']}")
    status = np.zeros((n,), np.int32)

    def run_slice(start, end):
        blob = b"\0".join(os.fsencode(p) for p in paths[start:end]) + b"\0"
        lib.decode_files(
            blob, end - start, h, w,
            out[start:end].ctypes.data_as(ctypes.c_void_p),
            status[start:end].ctypes.data_as(ctypes.c_void_p))

    if num_workers <= 1 or n <= 1:
        run_slice(0, n)
    else:
        import concurrent.futures as fut

        workers = min(num_workers, n)
        step = -(-n // workers)
        with fut.ThreadPoolExecutor(workers) as pool:
            list(pool.map(lambda s: run_slice(s, min(s + step, n)),
                          range(0, n, step)))
    bad = np.nonzero(status)[0]
    if len(bad):
        raise ValueError(
            f"jpeg decode failed for {len(bad)} files, first: "
            f"{paths[bad[0]]} (status {status[bad[0]]})")
    return out
