"""ctypes binding for the native HSPS reader (native/hsps_loader.cpp).

Falls back to the pure-NumPy PatchStore when the shared library cannot be
built. CONTRACT DIFFERENCE: NativePatchStore indexes the store's FULL
patch list, while PatchStore indexes its (optionally name-filtered)
valid_idx space — compose with PatchStore.valid_idx for filtered training.
With no filter the two agree byte-for-byte (tests assert it).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native"
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libhsps.so")


def _build_library() -> Optional[str]:
    if os.path.exists(_SO_PATH):
        return _SO_PATH
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
        return _SO_PATH if os.path.exists(_SO_PATH) else None
    except Exception:
        return None


_lib = None  # None = not tried; False = build failed (cached); else CDLL


def _load():
    global _lib
    if _lib is not None:
        return _lib or None
    path = _build_library()
    if path is None:
        _lib = False  # cache the failure: don't re-spawn make every call
        return None
    lib = ctypes.CDLL(path)
    lib.hsps_open.restype = ctypes.c_void_p
    lib.hsps_open.argtypes = [ctypes.c_char_p]
    lib.hsps_count.restype = ctypes.c_int64
    lib.hsps_count.argtypes = [ctypes.c_void_p]
    lib.hsps_shape.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
    lib.hsps_gather.restype = ctypes.c_int
    lib.hsps_gather.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32,
    ]
    lib.hsps_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativePatchStore:
    """Native mmap + threaded gather over an HSPS directory. Index space is
    the store's FULL patch list (no name filter; compose with PatchStore's
    valid_idx for filtered training)."""

    def __init__(self, path: str, n_threads: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native hsps library unavailable (g++ build failed)")
        self._lib = lib
        self._h = lib.hsps_open(path.encode())
        if not self._h:
            raise FileNotFoundError(path)
        self.n_threads = n_threads

    def _handle(self):
        if not getattr(self, "_h", None):
            raise RuntimeError("NativePatchStore is closed")
        return self._h

    def __len__(self) -> int:
        return int(self._lib.hsps_count(self._handle()))

    def shape_of(self, i: int):
        chw = (ctypes.c_int32 * 3)()
        self._lib.hsps_shape(self._handle(), int(i), chw)
        return (chw[0], chw[1], chw[2])

    def gather(self, idxs: np.ndarray) -> np.ndarray:
        """Batched read. All requested patches must share one shape (the
        writer's 64x64xC contract); raises ValueError otherwise — use
        `gather_grouped` for stores mixing scales. Indices wrap Python-style
        (negative / >= len select modulo the count, like PatchStore)."""
        idxs = np.ascontiguousarray(idxs, np.int64)
        if len(idxs) == 0:
            return np.empty((0,), np.float32)
        c, h, w = self.shape_of(int(idxs[0]) % len(self))
        out = np.empty((len(idxs), c, h, w), np.float32)
        rc = self._lib.hsps_gather(
            self._handle(),
            idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idxs),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self.n_threads,
        )
        if rc != 0:
            raise ValueError("mixed patch shapes in gather")
        return out

    def gather_grouped(self, idxs: np.ndarray):
        """Shape-safe gather: tries the single batched read first (the
        native rc detects shape mixing), and only on mixed shapes groups the
        indices and reads per group, returning a list of arrays in the
        ORIGINAL request order."""
        idxs = np.ascontiguousarray(idxs, np.int64)
        try:
            return list(self.gather(idxs))
        except ValueError:
            pass
        shapes = [self.shape_of(int(i) % len(self)) for i in idxs]
        out = [None] * len(idxs)
        by_shape = {}
        for pos, s in enumerate(shapes):
            by_shape.setdefault(s, []).append(pos)
        for s, positions in by_shape.items():
            batch = self.gather(idxs[np.asarray(positions)])
            for p, arr in zip(positions, batch):
                out[p] = arr
        return out

    def close(self):
        if getattr(self, "_h", None):
            self._lib.hsps_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_available() -> bool:
    return _load() is not None
