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
        i64, i32, p = ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p
        lib.patch_encode.argtypes = [p, i64, p, p, i32, p, p, i32, p, p, i64]
        lib.patch_encode.restype = i64
        lib.patch_decode.argtypes = [
            p, i64, i32, i32, i32, p, p, p, p, i64, p, p, p, i64,
        ]
        lib.patch_decode.restype = i64
        lib.slim_graph_parse.argtypes = [ctypes.c_char_p, p, p, p]
        lib.slim_graph_parse.restype = i64
        lib.hnsw_graph_parse.argtypes = [ctypes.c_char_p, p, p]
        lib.hnsw_graph_parse.restype = i64
        lib.chal_pack.argtypes = [p, p, i32, p, i64, p, p]
        lib.chal_pack.restype = i64
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


def patch_encode(node_ids, levels, lvl_off, nbr, vectors, is_new) -> bytes | None:
    """Native record encoding (persist/patch.py wire format); None if the
    library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    node_ids = np.ascontiguousarray(node_ids, np.int32)
    levels = np.ascontiguousarray(levels, np.int32)
    lvl_off = np.ascontiguousarray(lvl_off, np.int32)
    nbr = np.ascontiguousarray(nbr, np.int32)
    is_new = np.ascontiguousarray(is_new, np.uint8)
    dim = 0
    vec_ptr = None
    if vectors is not None:
        vectors = np.ascontiguousarray(vectors, np.float32)
        dim = vectors.shape[1]
        vec_ptr = vectors.ctypes.data
    lv = levels[node_ids]
    off = lvl_off[node_ids]
    totals = off[np.arange(len(node_ids)), lv + 1] - off[:, 0]
    cap = int(
        (13 + 4 * (lv + 1) + 4 * totals
         + np.where(is_new > 0, 4 * dim, 0)).sum()
    ) + 64
    out = np.empty(cap, np.uint8)
    got = lib.patch_encode(
        node_ids.ctypes.data, len(node_ids), levels.ctypes.data,
        lvl_off.ctypes.data, lvl_off.shape[1], nbr.ctypes.data,
        vec_ptr, dim, is_new.ctypes.data, out.ctypes.data, cap,
    )
    if got < 0:
        raise RuntimeError(f"patch_encode failed: {got}")
    return out[:got].tobytes()


def patch_decode(body: bytes, has_vec: bool, dim: int, max_level_cap: int,
                 max_records: int):
    """Native record decoding. Returns dict of arrays or None."""
    lib = _lib()
    if lib is None:
        return None
    buf = np.frombuffer(body, np.uint8)
    n = max_records
    out_ids = np.empty(n, np.int32)
    out_levels = np.empty(n, np.int32)
    out_rel = np.empty((n, max_level_cap + 2), np.int32)
    nbr_cap = max(len(body) // 4 + 1, 1)
    out_nbr = np.empty(nbr_cap, np.int32)
    out_nbr_off = np.empty(n + 1, np.int64)
    out_vecs = np.empty((n, dim if has_vec else 1), np.float32)
    out_is_new = np.empty(n, np.uint8)
    got = lib.patch_decode(
        buf.ctypes.data, len(body), 1 if has_vec else 0, dim, max_level_cap,
        out_ids.ctypes.data, out_levels.ctypes.data, out_rel.ctypes.data,
        out_nbr.ctypes.data, nbr_cap, out_nbr_off.ctypes.data,
        out_vecs.ctypes.data, out_is_new.ctypes.data, n,
    )
    if got < 0:
        raise RuntimeError(f"patch_decode failed: {got}")
    got = int(got)
    return dict(
        ids=out_ids[:got], levels=out_levels[:got], rel=out_rel[:got],
        nbr=out_nbr, nbr_off=out_nbr_off[: got + 1],
        vecs=out_vecs[:got], is_new=out_is_new[:got],
    )


def slim_graph_parse(path, n: int, maxlevel: int):
    """Native parse of a ref_harness slim dump body (header parsed by the
    caller). Returns (levels i32[n], lvl_off i32[n, maxlevel+2],
    nbr i32[total_edges]) or None if the library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    levels = np.empty(n, np.int32)
    lvl_off = np.empty((n, maxlevel + 2), np.int32)
    total = lib.slim_graph_parse(str(path).encode(), levels.ctypes.data,
                                 lvl_off.ctypes.data, None)
    if total < 0:
        raise IOError(f"slim_graph_parse failed ({total}) for {path}")
    nbr = np.empty(int(total), np.int32)
    got = lib.slim_graph_parse(str(path).encode(), levels.ctypes.data,
                               lvl_off.ctypes.data, nbr.ctypes.data)
    if got != total:
        raise IOError(f"slim_graph_parse refill mismatch ({got} != {total})")
    return levels, lvl_off, nbr


def hnsw_graph_parse(path, n: int, maxlevel: int, maxm: int, maxm0: int):
    """Native parse of a ref_harness hnsw dump. Returns (levels i32[n],
    adjs list of i32[n, cap_l] filled with -1 padding) or None."""
    lib = _lib()
    if lib is None:
        return None
    levels = np.empty(n, np.int32)
    adjs = [np.full((n, maxm0 if l == 0 else maxm), -1, np.int32)
            for l in range(maxlevel + 1)]
    ptrs = (ctypes.c_void_p * (maxlevel + 1))(
        *[a.ctypes.data for a in adjs]
    )
    got = lib.hnsw_graph_parse(str(path).encode(), levels.ctypes.data, ptrs)
    if got != n:
        raise IOError(f"hnsw_graph_parse failed ({got}) for {path}")
    return levels, adjs


def chal_pack(per_level_rows, levels):
    """Native CHAL packing. Returns (lvl_off i32[n, lcnt+1], nbr i32[total])
    or None if the library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    lcnt = len(per_level_rows)
    rows = [np.ascontiguousarray(r, np.int32) for r in per_level_rows]
    levels = np.ascontiguousarray(levels, np.int32)
    n = len(levels)
    widths = np.asarray([r.shape[1] for r in rows], np.int32)
    ptrs = (ctypes.c_void_p * lcnt)(*[r.ctypes.data for r in rows])
    lvl_off = np.empty((n, lcnt + 1), np.int32)
    total = lib.chal_pack(ptrs, widths.ctypes.data, lcnt,
                          levels.ctypes.data, n, lvl_off.ctypes.data, None)
    if total < 0:
        raise RuntimeError(f"chal_pack failed: {total}")
    nbr = np.empty(int(total), np.int32)
    got = lib.chal_pack(ptrs, widths.ctypes.data, lcnt, levels.ctypes.data,
                        n, lvl_off.ctypes.data, nbr.ctypes.data)
    if got != total:
        raise RuntimeError(f"chal_pack refill mismatch ({got} != {total})")
    return lvl_off, nbr
