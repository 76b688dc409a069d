"""ctypes binding for the native C++ trajectory-window loader (csrc/loader.cpp).

Equivalent of the reference's DataLoader(num_workers=4) + create_data window
slicing (mmpde.py:205-213, data_creator_2d.py:139-154), as a native
producer-thread ring over a memory-mapped .npy dataset.  Builds the shared
library on first use (g++ -O3) and caches it next to the source.

Falls back cleanly: callers can use the pure-numpy path (solver.train
iterate_batches) when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "loader.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libmmloader.so")
_build_lock = threading.Lock()
_lib = None


def _build() -> str:
    with _build_lock:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
                 _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.mm_open.restype = ctypes.c_void_p
        lib.mm_open.argtypes = [ctypes.c_char_p]
        lib.mm_ndim.restype = ctypes.c_int
        lib.mm_ndim.argtypes = [ctypes.c_void_p]
        lib.mm_shape.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int64)]
        lib.mm_close.argtypes = [ctypes.c_void_p]
        lib.mm_sampler_new.restype = ctypes.c_void_p
        lib.mm_sampler_new.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64, ctypes.c_int]
        lib.mm_sampler_set_shrink.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mm_sampler_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)]
        lib.mm_sampler_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class NativeWindowLoader:
    """Streams (data_window, label_window, steps) batches from a .npy file.

    data/labels: float32 [B, tw, *spatial]; steps: int64 [B] (the label
    window starts at ``steps``, history ends there — matching
    GraphCreator.create_data).
    """

    def __init__(self, path: str, batch_size: int, time_window: int,
                 traj_lo: int, traj_hi: int, seed: int = 0,
                 prefetch: int = 4):
        lib = _load()
        self._lib = lib
        self._ds = lib.mm_open(path.encode())
        if not self._ds:
            raise OSError(f"cannot open npy dataset {path} "
                          "(float32 C-order required)")
        ndim = lib.mm_ndim(self._ds)
        shape = (ctypes.c_int64 * ndim)()
        lib.mm_shape(self._ds, shape)
        self.shape = tuple(shape[i] for i in range(ndim))
        self.spatial = self.shape[2:]
        self.batch_size = batch_size
        self.tw = time_window
        self._s = lib.mm_sampler_new(self._ds, batch_size, time_window,
                                     traj_lo, traj_hi, seed, prefetch)
        n = batch_size * time_window * int(np.prod(self.spatial))
        self._data = np.empty(n, dtype=np.float32)
        self._labels = np.empty(n, dtype=np.float32)
        self._steps = np.empty(batch_size, dtype=np.int64)

    def set_unroll_shrink(self, shrink: int):
        self._lib.mm_sampler_set_shrink(self._s, shrink)

    def next(self):
        self._lib.mm_sampler_next(
            self._s,
            self._data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._labels.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._steps.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        shp = (self.batch_size, self.tw) + self.spatial
        return (self._data.reshape(shp).copy(),
                self._labels.reshape(shp).copy(),
                self._steps.copy())

    def close(self):
        if self._s:
            self._lib.mm_sampler_free(self._s)
            self._s = None
        if self._ds:
            self._lib.mm_close(self._ds)
            self._ds = None

    def __del__(self):  # best-effort
        try:
            self.close()
        except Exception:
            pass
