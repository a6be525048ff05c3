"""ctypes bindings for the native C++ data-plane (native/dataplane.cc).

Provides mmap-based fvecs/ivecs readers and the patch record codec. Falls
back to the pure-numpy implementations transparently when the shared library
has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    root = Path(__file__).resolve().parents[2] / "native"
    so = root / "libdataplane.so"
    if not so.exists():
        try:  # build on first use; quick (one TU)
            subprocess.run(
                ["make", "-C", str(root)], check=True, capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if so.exists():
        lib = ctypes.CDLL(str(so))
        lib.vecs_size.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.vecs_size.restype = ctypes.c_int
        lib.vecs_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
        ]
        lib.vecs_read.restype = ctypes.c_int64
        lib.vecs_write.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32
        ]
        lib.vecs_write.restype = ctypes.c_int64
        _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def read_vecs(path, dtype=np.float32, max_num: int = 0) -> np.ndarray | None:
    """Native fvecs/ivecs read; None if the library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    dim = ctypes.c_int32()
    num = ctypes.c_int64()
    if lib.vecs_size(str(path).encode(), ctypes.byref(dim), ctypes.byref(num)) != 0:
        raise IOError(f"bad vecs file: {path}")
    n = num.value if max_num <= 0 else min(max_num, num.value)
    out = np.empty((n, dim.value), np.float32)
    got = lib.vecs_read(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
    )
    if got != n:
        raise IOError(f"native read failed ({got}) for {path}")
    return out if dtype == np.float32 else out.view(dtype)


def write_vecs(path, data: np.ndarray) -> bool:
    lib = _lib()
    if lib is None:
        return False
    data = np.ascontiguousarray(data)
    n, d = data.shape
    got = lib.vecs_write(str(path).encode(), data.ctypes.data, n, d)
    return got == n
