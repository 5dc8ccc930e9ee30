"""ctypes loader for the native runtime helpers (native/dbg_native.cpp).

Builds the shared library on first use (g++ is part of the baked toolchain).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_ROOT, "native", "build", "libdbg_native.so")
_SRCS = [os.path.join(_ROOT, "native", f)
         for f in ("dbg_native.cpp", "correct_engine.cpp")]

_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or any(os.path.getmtime(_SO) < os.path.getmtime(s)
                   for s in _SRCS)):
        subprocess.run(["make", "-C", os.path.join(_ROOT, "native")],
                       check=True, capture_output=True)
    _lib = ctypes.CDLL(_SO)
    _lib.jenkins64.restype = ctypes.c_uint64
    _lib.jenkins64.argtypes = [ctypes.c_uint64]
    _lib.find_next_prime.restype = ctypes.c_uint64
    _lib.find_next_prime.argtypes = [ctypes.c_uint64]
    _lib.hash_layout.restype = ctypes.c_int64
    _lib.stdsort_perm_desc.restype = None
    _lib.gcc44_sort_perm_desc.restype = None
    _lib.correct_batch.restype = None
    return _lib


def jenkins64(x) -> np.ndarray:
    """Vectorized Jenkins 64-bit hash (numpy; parity kmerSet.h:105-116)."""
    with np.errstate(over="ignore"):
        k = np.asarray(x, dtype=np.uint64)
        k = k + ~(k << np.uint64(32))
        k = k ^ (k >> np.uint64(22))
        k = k + ~(k << np.uint64(13))
        k = k ^ (k >> np.uint64(8))
        k = k + (k << np.uint64(3))
        k = k ^ (k >> np.uint64(15))
        k = k + ~(k << np.uint64(27))
        k = k ^ (k >> np.uint64(31))
        return k


def find_next_prime(n: int) -> int:
    return int(lib().find_next_prime(ctypes.c_uint64(n)))


def hash_layout(kmers_in_order: np.ndarray, size: int):
    """Slot assignment for keys inserted in the given order.
    Returns (slots int64 [n], conflicts)."""
    km = np.ascontiguousarray(kmers_in_order, dtype=np.uint64)
    occ = np.zeros(size, dtype=np.uint8)
    out = np.empty(len(km), dtype=np.int64)
    conflicts = lib().hash_layout(
        km.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_int64(len(km)), ctypes.c_uint64(size),
        occ.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out, int(conflicts)


def correct_batch(reads: np.ndarray, offsets: np.ndarray, lens: np.ndarray,
                  bits: np.ndarray, bitmap: np.ndarray, params) -> tuple:
    """Native 5-phase correction of a read batch IN PLACE.

    reads: uint8 concatenated read bytes (modified in place);
    offsets/lens per read; bits: [n, P] phase-1 flags (uint8, row stride =
    bits.shape[1]); params: resolved CorrectParams.
    Returns (one_score, multi_score, deleted, trim_left, trim_right).
    """
    n = len(lens)
    one = np.zeros(n, np.int32)
    multi = np.zeros(n, np.int32)
    deleted = np.zeros(n, np.int32)
    tl = np.zeros(n, np.int32)
    tr = np.zeros(n, np.int32)
    L = lib()
    L.correct_batch(
        reads.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.ascontiguousarray(offsets, np.int64).ctypes
        .data_as(ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(lens, np.int32).ctypes
        .data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(n),
        np.ascontiguousarray(bits, np.uint8).ctypes
        .data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(bits.shape[1] if bits.ndim == 2 else 0),
        bitmap.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(params.ksize), ctypes.c_int(params.high_freq_reg_len),
        ctypes.c_int(params.max_change), ctypes.c_int(params.further_trim),
        ctypes.c_int64(params.max_bbt_nodes),
        ctypes.c_int(params.min_read_len),
        one.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        multi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        deleted.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return one, multi, deleted, tl, tr


def stdsort_perm_desc(lens: np.ndarray) -> np.ndarray:
    """Index permutation of the HOST libstdc++ std::sort, descending by len."""
    ln = np.ascontiguousarray(lens, dtype=np.uint64)
    out = np.empty(len(ln), dtype=np.int64)
    lib().stdsort_perm_desc(
        ln.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_int64(len(ln)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def gcc44_sort_perm_desc(lens: np.ndarray) -> np.ndarray:
    """Index permutation of GCC 4.4's std::sort (the reference binaries'
    compiler), descending by len — reproduces the reference's unstable tie
    order exactly."""
    ln = np.ascontiguousarray(lens, dtype=np.uint64)
    out = np.empty(len(ln), dtype=np.int64)
    lib().gcc44_sort_perm_desc(
        ln.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_int64(len(ln)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out
