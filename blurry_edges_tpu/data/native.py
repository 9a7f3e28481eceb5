"""ctypes bindings + build for the native batch-gather kernel, and a
double-buffered prefetching batch loader.

The reference moves data per item inside __getitem__ (data/dataset.py:41-46,
single-threaded, no DataLoader workers). Here host batch assembly is a
threaded C++ row-gather (native/npy_gather.cpp) running one batch ahead of
the training step on a background thread, so the host never stalls the
device. Falls back to numpy fancy indexing when the toolchain is missing.
"""

from __future__ import annotations

import ctypes
import os
import queue
import subprocess
import threading
from typing import Dict, Iterator, Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native", "npy_gather.cpp")
_BUILD_DIR = os.path.join(os.path.dirname(_SRC), "build")
_LIB_PATH = os.path.join(_BUILD_DIR, "libnpy_gather.so")

_lib = None
_lib_tried = False


def _load_library() -> Optional[ctypes.CDLL]:
    """Build (once) and load the native kernel; None when unavailable."""
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH) or (os.path.getmtime(_LIB_PATH)
                                             < os.path.getmtime(_SRC)):
            os.makedirs(_BUILD_DIR, exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                 _SRC, "-o", _LIB_PATH],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gather_rows.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int64, ctypes.c_char_p, ctypes.c_int]
        lib.gather_rows_scaled_f32.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        _lib = lib
    except (OSError, subprocess.CalledProcessError):
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def gather_rows(src: np.ndarray, idx: np.ndarray, n_threads: int = 8) -> np.ndarray:
    """dst[i] = src[idx[i]] with a threaded native copy; numpy fallback."""
    lib = _load_library()
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    if lib is None:
        return src[idx]
    out = np.empty((idx.shape[0],) + src.shape[1:], dtype=src.dtype)
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    lib.gather_rows(
        src.ctypes.data_as(ctypes.c_char_p),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.shape[0], row_bytes,
        out.ctypes.data_as(ctypes.c_char_p), n_threads)
    return out


def gather_rows_scaled(src: np.ndarray, idx: np.ndarray, alpha: np.ndarray,
                       n_threads: int = 8) -> np.ndarray:
    """dst[i] = src[idx[i]] / alpha[idx[i]] fused in the native pass
    (the per-sample photon-level normalization of data/dataset.py:41-47)."""
    lib = _load_library()
    src = np.ascontiguousarray(src, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    alpha = np.ascontiguousarray(alpha, dtype=np.float32)
    if lib is None:
        a = alpha[idx].reshape((-1,) + (1,) * (src.ndim - 1))
        return src[idx] / a
    out = np.empty((idx.shape[0],) + src.shape[1:], dtype=np.float32)
    row_elems = int(np.prod(src.shape[1:], dtype=np.int64))
    lib.gather_rows_scaled_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        idx.shape[0], row_elems,
        alpha.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    return out


class PrefetchLoader:
    """Background-thread batch assembler: yields dict batches one step ahead.

    arrays: {name: (array, scale_by_alpha)}; alpha: (n,) photon levels.
    Iterates len(order)//batch_size batches of the given index order.
    """

    def __init__(self, arrays: Dict[str, tuple], alpha: np.ndarray,
                 order: np.ndarray, batch_size: int, n_threads: int = 8,
                 depth: int = 2):
        self.arrays = arrays
        self.alpha = alpha
        self.order = order
        self.batch_size = batch_size
        self.n_threads = n_threads
        self.depth = depth

    def _make(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        out = {}
        for name, (arr, scaled) in self.arrays.items():
            if scaled:
                out[name] = gather_rows_scaled(arr, idx, self.alpha, self.n_threads)
            else:
                out[name] = gather_rows(arr, idx, self.n_threads)
        return out

    def __len__(self) -> int:
        return len(self.order) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        nb = len(self)

        def producer():
            for b in range(nb):
                idx = self.order[b * self.batch_size:(b + 1) * self.batch_size]
                q.put(self._make(idx))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            yield batch
        t.join()
