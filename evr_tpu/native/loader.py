"""ctypes binding + on-demand build for the native staging pipeline.

The shared library is built from ``src/image_loader.cc`` with g++ on first
use (cached next to this file); every consumer degrades gracefully to the
Python/cv2 path when the toolchain or libjpeg is unavailable
(``native_available()`` gates the fast path in
``evr_tpu.index.engine.EmbeddingEngine``).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_HERE = pathlib.Path(__file__).parent
_SRC = _HERE / "src" / "image_loader.cc"
_LIB = _HERE / "libevr_native.so"
_lock = threading.Lock()
_lib_handle = None
_build_failed = False


def build_native(force: bool = False) -> pathlib.Path | None:
    """Compile the shared library; returns its path or None on failure."""
    global _build_failed
    if _LIB.exists() and not force and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        "-pthread",
        str(_SRC),
        "-o",
        str(_LIB),
        "-ljpeg",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        _build_failed = False
        return _LIB
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        _build_failed = True
        return None


def _get_lib():
    global _lib_handle
    with _lock:
        if _lib_handle is not None:
            return _lib_handle
        if _build_failed:
            return None
        path = build_native()
        if path is None:
            return None
        lib = ctypes.CDLL(str(path))
        lib.evr_stage_image.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.evr_stage_image.restype = ctypes.c_int
        lib.evr_stage_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.evr_stage_batch.restype = ctypes.c_int
        _lib_handle = lib
        return lib


def native_available() -> bool:
    return _get_lib() is not None


class NativeStager:
    """Batch JPEG→staged-uint8 pipeline backed by the C++ thread pool."""

    def __init__(self, image_size: int = 224, n_threads: int | None = None):
        self.image_size = image_size
        self.n_threads = n_threads or max(1, os.cpu_count() or 1)
        self._lib = _get_lib()
        if self._lib is None:
            raise RuntimeError("native staging library unavailable (g++/libjpeg missing?)")

    def stage_batch(self, paths) -> tuple[np.ndarray, list[int]]:
        """Stage a list of JPEG paths → (uint8 [N, S, S, 3], ok_indices).

        Failed decodes are reported by index (not zero-filled); callers drop
        those rows the same way the Python path skips unreadable frames.
        """
        n = len(paths)
        size = self.image_size
        out = np.empty((n, size, size, 3), dtype=np.uint8)
        status = np.zeros(n, dtype=np.int32)
        arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
        self._lib.evr_stage_batch(
            arr,
            n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            size,
            self.n_threads,
            status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        ok = [i for i in range(n) if status[i] == 0]
        return out, ok
