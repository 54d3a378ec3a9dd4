"""ctypes bindings for the native graphcore library (numpy fallback).

Builds `libgraphcore.so` on first import if a compiler is available;
falls back silently to the numpy implementations in
redgnn_tpu.graph.{kg,calibrate} otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libgraphcore.so")
_LIB: Optional[ctypes.CDLL] = None


def _build() -> bool:
    src = os.path.join(_HERE, "graphcore.cpp")
    tmp = _SO + ".tmp"
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src,
             "-o", tmp],
            check=True, capture_output=True, timeout=120,
        )
        # new inode: dlopen caches by (dev, inode), so an in-place
        # overwrite would hand back the stale handle after a rebuild
        os.replace(tmp, _SO)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    if not os.path.exists(_SO) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    if not hasattr(lib, "per_query_hop_counts"):
        # stale .so from an older source revision: rebuild and reload
        # (_build compiles to a .tmp and os.replace's it, so the path gets
        # a NEW inode and dlopen's (dev, inode) cache misses — an in-place
        # overwrite would hand back this same stale handle)
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        if not hasattr(lib, "per_query_hop_counts"):
            return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.build_csr.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                              i32p, i32p, i32p]
    lib.build_csr.restype = ctypes.c_int
    lib.build_csr_temporal.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                       i32p, i32p, i32p, i32p, i32p]
    lib.build_csr_temporal.restype = ctypes.c_int
    lib.simulate_hops.argtypes = [i32p, i32p, ctypes.c_int64, i64p,
                                  ctypes.c_int64, ctypes.c_int64, i64p, i64p]
    lib.simulate_hops.restype = ctypes.c_int
    lib.simulate_hops_windowed.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p]
    lib.simulate_hops_windowed.restype = ctypes.c_int
    lib.per_query_hop_counts.argtypes = [
        i32p, i32p, ctypes.c_int64, i64p, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p]
    lib.per_query_hop_counts.restype = ctypes.c_int
    lib.per_query_hop_counts_windowed.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        i64p, i64p]
    lib.per_query_hop_counts_windowed.restype = ctypes.c_int
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_csr(triples: np.ndarray, n_ent: int
              ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    triples = np.ascontiguousarray(triples, np.int64)
    n = len(triples)
    rowptr = np.zeros(n_ent + 1, np.int32)
    rel = np.zeros(n, np.int32)
    tail = np.zeros(n, np.int32)
    if lib.build_csr(triples, n, n_ent, rowptr, rel, tail) != 0:
        return None
    return rowptr, rel, tail


def simulate_hops(rowptr: np.ndarray, tail: np.ndarray, n_ent: int,
                  heads: np.ndarray, n_layer: int):
    lib = _load()
    if lib is None:
        return None
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    tail = np.ascontiguousarray(tail, np.int32)
    heads = np.ascontiguousarray(heads, np.int64)
    nc = np.zeros(n_layer + 1, np.int64)
    ec = np.zeros(n_layer, np.int64)
    if lib.simulate_hops(rowptr, tail, n_ent, heads, len(heads), n_layer,
                         nc, ec) != 0:
        return None
    return nc.tolist(), ec.tolist()


def per_query_hop_counts(rowptr: np.ndarray, tail: np.ndarray, n_ent: int,
                         heads: np.ndarray, n_layer: int
                         ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """(n, n_layer+1) node counts and (n, n_layer) edge counts per query."""
    lib = _load()
    if lib is None:
        return None
    rowptr = np.ascontiguousarray(rowptr, np.int32)
    tail = np.ascontiguousarray(tail, np.int32)
    heads = np.ascontiguousarray(heads, np.int64)
    n = len(heads)
    nc = np.zeros((n, n_layer + 1), np.int64)
    ec = np.zeros((n, n_layer), np.int64)
    if lib.per_query_hop_counts(rowptr, tail, n_ent, heads, n, n_layer,
                                nc, ec) != 0:
        return None
    return nc, ec


def per_query_hop_counts_windowed(
        ekey: np.ndarray, tail: np.ndarray, n_ent: int, key_base: int,
        heads: np.ndarray, times: np.ndarray, window: int, n_layer: int
        ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = _load()
    if lib is None:
        return None
    ekey = np.ascontiguousarray(ekey, np.int32)
    tail = np.ascontiguousarray(tail, np.int32)
    heads = np.ascontiguousarray(heads, np.int64)
    times = np.ascontiguousarray(times, np.int64)
    n = len(heads)
    nc = np.zeros((n, n_layer + 1), np.int64)
    ec = np.zeros((n, n_layer), np.int64)
    if lib.per_query_hop_counts_windowed(
            ekey, tail, len(ekey), n_ent, key_base, heads, times, n,
            window, n_layer, nc, ec) != 0:
        return None
    return nc, ec


def simulate_hops_windowed(ekey: np.ndarray, tail: np.ndarray, n_ent: int,
                           key_base: int, heads: np.ndarray,
                           times: np.ndarray, window: int, n_layer: int):
    lib = _load()
    if lib is None:
        return None
    ekey = np.ascontiguousarray(ekey, np.int32)
    tail = np.ascontiguousarray(tail, np.int32)
    heads = np.ascontiguousarray(heads, np.int64)
    times = np.ascontiguousarray(times, np.int64)
    nc = np.zeros(n_layer + 1, np.int64)
    ec = np.zeros(n_layer, np.int64)
    if lib.simulate_hops_windowed(ekey, tail, len(ekey), n_ent, key_base,
                                  heads, times, len(heads), window,
                                  n_layer, nc, ec) != 0:
        return None
    return nc.tolist(), ec.tolist()
