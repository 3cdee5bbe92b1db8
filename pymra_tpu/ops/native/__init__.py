"""ctypes bindings to the native planner core (csrc/planner.cpp).

The shared library is built lazily with the system compiler on first use and
cached next to this package. Everything here degrades gracefully: if no
compiler is available, callers fall back to the pure-numpy implementations
in :mod:`pymra_tpu.tree.plan`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "kmeans", "kmeans_batch", "quadrant_split"]

_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _source_path() -> str:
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(os.path.dirname(os.path.dirname(here)))
    return os.path.join(repo, "csrc", "planner.cpp")


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "libpymra_planner.so")


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so = _lib_path()
        src = _source_path()
        try:
            if (not os.path.exists(so)
                    or (os.path.exists(src)
                        and os.path.getmtime(src) > os.path.getmtime(so))):
                if not os.path.exists(src):
                    return None
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", so, src],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(so)
        except Exception:
            return None

        lib.pymra_kmeans.restype = ctypes.c_int
        lib.pymra_kmeans.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pymra_kmeans_batch.restype = ctypes.c_int
        lib.pymra_kmeans_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.pymra_quadrant_split.restype = ctypes.c_int
        lib.pymra_quadrant_split.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def kmeans(points: np.ndarray, k: int, seed: int = 0, max_iter: int = 50):
    """Deterministic kmeans++/Lloyd. Returns (centers [k, d], labels [n])."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native planner library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n, d = pts.shape
    k = min(k, n)
    centers = np.empty((k, d), dtype=np.float64)
    labels = np.empty(n, dtype=np.int32)
    rc = lib.pymra_kmeans(
        _dptr(pts), n, d, k, max_iter, seed, _dptr(centers),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc < 0:
        raise ValueError("pymra_kmeans failed")
    return centers, labels.astype(np.int64)


def kmeans_batch(points: np.ndarray, offsets: np.ndarray, k: int,
                 seed: int = 0, max_iter: int = 50):
    """k-means over many concatenated point sets in one native call.

    Args:
      points: [total, d] concatenated sets.
      offsets: [n_sets + 1] prefix offsets delimiting each set.

    Returns (centers [n_sets, k, d], labels [total]).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native planner library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    offs = np.ascontiguousarray(offsets, dtype=np.int64)
    n_sets = len(offs) - 1
    d = pts.shape[1]
    centers = np.empty((n_sets, k, d), dtype=np.float64)
    labels = np.empty(len(pts), dtype=np.int32)
    rc = lib.pymra_kmeans_batch(
        _dptr(pts), offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_sets, d, k, max_iter, seed, _dptr(centers),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc < 0:
        raise ValueError("pymra_kmeans_batch failed")
    return centers, labels.astype(np.int64)


def quadrant_split(points: np.ndarray) -> np.ndarray:
    """Mean-quadrant labels (0..3) for a 2-D point set."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native planner library unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    labels = np.empty(len(pts), dtype=np.int32)
    rc = lib.pymra_quadrant_split(
        _dptr(pts), len(pts),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc < 0:
        raise ValueError("pymra_quadrant_split failed")
    return labels.astype(np.int64)
