"""ctypes binding for the native async checkpoint writer (csrc/writer.cpp).

The reference torch.saves checkpoints synchronously inside the epoch loop
(reference mmpde.py:316-319, mesh/dmm.py:85); here serialisation happens on
the caller's thread (cheap flax msgpack) and the disk IO — write *.tmp,
fsync, atomic rename — runs on a native writer thread with latest-wins
double buffering, so the training loop never blocks on storage.

Builds the shared library on first use (g++ -O3) and caches it next to the
source.  ``save_checkpoint`` remains the synchronous fallback.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
import threading
from typing import Any, Optional

import flax.serialization

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "writer.cpp")
_LIB_PATH = os.path.join(os.path.dirname(_SRC), "libmmwriter.so")
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
        lib.mmw_open.restype = ctypes.c_void_p
        lib.mmw_open.argtypes = [ctypes.c_char_p]
        lib.mmw_submit.restype = ctypes.c_int64
        lib.mmw_submit.argtypes = [ctypes.c_void_p,
                                   ctypes.POINTER(ctypes.c_uint8),
                                   ctypes.c_int64, ctypes.c_char_p]
        lib.mmw_flush.restype = ctypes.c_int
        lib.mmw_flush.argtypes = [ctypes.c_void_p]
        lib.mmw_written.restype = ctypes.c_int64
        lib.mmw_written.argtypes = [ctypes.c_void_p]
        lib.mmw_dropped.restype = ctypes.c_int64
        lib.mmw_dropped.argtypes = [ctypes.c_void_p]
        lib.mmw_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


class AsyncCheckpointWriter:
    """Non-blocking checkpoint persistence into a ``save_checkpoint``-format
    directory (state.msgpack + config.json, loadable by ``load_checkpoint``).

    save() serialises and queues; IO happens on the native thread.  If a
    newer snapshot arrives while one is still queued, the older queued one
    is dropped (latest wins).  flush() blocks until everything queued is on
    disk; close() flushes and joins.
    """

    def __init__(self, path: str):
        self._lib = _load()
        self._h = self._lib.mmw_open(path.encode())
        if not self._h:
            raise OSError(f"cannot open checkpoint dir {path}")
        self.path = path

    def save(self, state: Any, config: Optional[dict] = None) -> int:
        blob = flax.serialization.to_bytes(state)
        cfg = (json.dumps(config, indent=2, default=str).encode()
               if config is not None else None)
        buf = (ctypes.c_uint8 * len(blob)).from_buffer_copy(blob)
        return self._lib.mmw_submit(self._h, buf, len(blob), cfg)

    def flush(self) -> None:
        err = self._lib.mmw_flush(self._h)
        if err:
            raise OSError(err, f"async checkpoint write failed: {err}")

    @property
    def written(self) -> int:
        return self._lib.mmw_written(self._h)

    @property
    def dropped(self) -> int:
        return self._lib.mmw_dropped(self._h)

    def close(self) -> None:
        if self._h:
            self.flush()
            self._lib.mmw_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
