"""ctypes bindings for the native packed-dataset reader.

Builds `native/packed_reader.cpp` on first use (g++ -O3 -shared) and
falls back to NumPy memmap slicing when no compiler is available — same
interface either way. The native path gathers records with a GIL-free
thread pool, overlapping host batch assembly with device compute.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_SRC = os.path.join(_REPO_ROOT, "native", "packed_reader.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libpacked_reader.so")
_lock = threading.Lock()
_lib = None


def _build_and_load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 "-pthread", _SRC, "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        lib.pr_open.restype = ctypes.c_void_p
        lib.pr_open.argtypes = [ctypes.c_char_p]
        lib.pr_close.argtypes = [ctypes.c_void_p]
        lib.pr_size.restype = ctypes.c_int64
        lib.pr_size.argtypes = [ctypes.c_void_p]
        lib.pr_gather.restype = ctypes.c_int
        lib.pr_gather.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _lib = lib
        return lib


def native_available() -> bool:
    try:
        _build_and_load()
        return True
    except Exception:
        return False


class PackedReader:
    """Random-access reader over a file of fixed-size records."""

    def __init__(self, path: str, record_shape: tuple, dtype=np.uint8,
                 n_threads: int = 4):
        self.record_shape = tuple(record_shape)
        self.dtype = np.dtype(dtype)
        self.record_bytes = int(np.prod(record_shape)) * self.dtype.itemsize
        self.n_threads = n_threads
        self._native = None
        self._handle = None
        try:
            lib = _build_and_load()
            handle = lib.pr_open(path.encode())
            if handle:
                self._native = lib
                self._handle = ctypes.c_void_p(handle)
                self.num_records = lib.pr_size(self._handle) // self.record_bytes
        except Exception:
            pass
        if self._native is None:  # numpy fallback
            size = os.path.getsize(path)
            self.num_records = size // self.record_bytes
            self._mm = np.memmap(path, dtype=self.dtype, mode="r",
                                 shape=(self.num_records,) + self.record_shape)

    def __len__(self) -> int:
        return int(self.num_records)

    def gather(self, indices: np.ndarray) -> np.ndarray:
        indices = np.ascontiguousarray(indices, np.int64)
        n = len(indices)
        if self._native is None:
            return np.asarray(self._mm[indices])
        out = np.empty((n,) + self.record_shape, self.dtype)
        rc = self._native.pr_gather(
            self._handle, self.record_bytes,
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.n_threads,
        )
        if rc != 0:
            raise IndexError("record index out of bounds")
        return out

    def close(self):
        if self._native is not None and self._handle:
            self._native.pr_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
