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
_SRC = os.path.join(_ROOT, "native", "dbg_native.cpp")

_lib = None


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
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
