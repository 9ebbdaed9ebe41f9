"""ctypes bindings for the native (C++/libjpeg) batch decoder.

The shared library (native/loader.cc) owns a persistent worker pool and
decodes whole batches in parallel without the GIL — the framework's
replacement for the tf.data C++ runtime the reference leans on
(dataset.py:19-27). Auto-builds on first use when a toolchain is present;
callers fall back to PIL when unavailable (data/celeba.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "_native", "libloader.so")
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_built() -> str:
    if not os.path.isfile(_LIB_PATH):
        script = os.path.join(_REPO_ROOT, "scripts", "build_native.sh")
        subprocess.run(["bash", script], check=True, capture_output=True, timeout=300)
    return _LIB_PATH


def _load_lib() -> ctypes.CDLL:
    lib = ctypes.CDLL(_ensure_built())
    lib.lg_loader_create.restype = ctypes.c_void_p
    lib.lg_loader_create.argtypes = [ctypes.c_int]
    lib.lg_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.lg_loader_load.restype = ctypes.c_int
    lib.lg_loader_load.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.lg_decode_file.restype = ctypes.c_int
    lib.lg_decode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.lg_loader_load_buffers.restype = ctypes.c_int
    lib.lg_loader_load_buffers.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_char_p),  # byte buffers (never NUL-terminated reads)
        ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


class NativeBatchLoader:
    """Parallel batch decode: list of JPEG paths -> (N, dim, dim, C) uint8."""

    def __init__(self, dim: int, channels: int, threads: int = 8):
        self._lib = _load_lib()
        self.dim = dim
        self.channels = channels
        self._handle = self._lib.lg_loader_create(threads)
        if not self._handle:
            raise RuntimeError("lg_loader_create failed")

    def load(self, paths: Sequence[str]) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, self.dim, self.dim, self.channels), np.uint8)
        c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
        failures = self._lib.lg_loader_load(
            self._handle,
            c_paths,
            n,
            self.dim,
            self.channels,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if failures:
            raise IOError(f"native loader: {failures}/{n} images failed to decode")
        return out

    def load_buffers(self, buffers: Sequence[bytes]) -> np.ndarray:
        """Parallel decode of in-memory JPEG byte strings (the zip-archive
        ingestion path: Python pulls member bytes, the C++ pool decodes
        without the GIL)."""
        n = len(buffers)
        out = np.empty((n, self.dim, self.dim, self.channels), np.uint8)
        # c_char_p keeps each bytes object alive via the array; lengths ride
        # alongside so embedded NULs in the JPEG stream are harmless
        c_bufs = (ctypes.c_char_p * n)(*buffers)
        c_lens = (ctypes.c_size_t * n)(*[len(b) for b in buffers])
        failures = self._lib.lg_loader_load_buffers(
            self._handle,
            c_bufs,
            c_lens,
            n,
            self.dim,
            self.channels,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        if failures:
            raise IOError(f"native loader: {failures}/{n} buffers failed to decode")
        return out

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            try:
                self._lib.lg_loader_destroy(handle)
            except Exception:
                pass
            self._handle = None
