"""ctypes binding for the C++ record-store batch gatherer."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SO = _DIR / "librecordstore.so"
_SRC = _DIR / "recordstore.cc"

_lib = None


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO), str(_SRC),
           "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            raise ImportError("could not build librecordstore.so")
    _lib = ctypes.CDLL(str(_SO))
    _lib.gather_records.argtypes = [
        ctypes.c_void_p,                       # base
        ctypes.POINTER(ctypes.c_int64),        # offsets
        ctypes.POINTER(ctypes.c_int64),        # indices
        ctypes.c_int64,                        # n_indices
        ctypes.c_int64,                        # header_bytes
        ctypes.POINTER(ctypes.c_int64),        # field_sizes
        ctypes.c_int32,                        # n_fields
        ctypes.POINTER(ctypes.c_void_p),       # out_ptrs
        ctypes.c_int32,                        # n_threads
    ]
    _lib.gather_records.restype = None
    return _lib


_load()  # raise at import if the toolchain is unavailable


def gather(buf: np.ndarray, offsets: np.ndarray, indices: np.ndarray,
           header_bytes: int, schema,
           n_threads: int = None) -> dict:
    """Gather `indices` into contiguous per-field batch arrays."""
    lib = _load()
    n_threads = n_threads or min(8, os.cpu_count() or 1)
    fields = schema.fields()
    sizes = np.asarray(
        [int(np.prod(shape)) * np.dtype(dt).itemsize
         for _, shape, dt in fields], dtype=np.int64)
    outs = {name: np.empty((len(indices),) + shape, dt)
            for name, shape, dt in fields}
    out_ptrs = (ctypes.c_void_p * len(fields))(
        *[outs[name].ctypes.data for name, _, _ in fields])
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    lib.gather_records(
        buf.ctypes.data_as(ctypes.c_void_p),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(indices), header_bytes,
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(fields), out_ptrs, n_threads)
    return outs
