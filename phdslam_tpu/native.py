"""ctypes bindings to the native C++ host runtime (native/).

Native equivalents of the reference's host C++ libraries (gm_reduce.cpp's
Eigen mixture reduction, the Munkres/Hungarian family) — auto-built on
first use with the in-image g++ toolchain; every entry point has a pure
NumPy fallback so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libphdslam_native.so")
_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        dp = ctypes.POINTER(ctypes.c_double)
        ip = ctypes.POINTER(ctypes.c_int32)
        lib.gm_reduce.restype = ctypes.c_int
        lib.gm_reduce.argtypes = [dp, dp, dp, ctypes.c_int, ctypes.c_int,
                                  ctypes.c_double, dp, dp, dp]
        lib.hungarian.restype = ctypes.c_double
        lib.hungarian.argtypes = [dp, ctypes.c_int, ctypes.c_int, ip]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def gm_reduce(w, mean, cov, min_distance: float):
    """Greedy GM reduction (native; falls back to ops.gm.reduce_mixture_np).

    Returns (w_out, mean_out, cov_out) trimmed numpy arrays."""
    lib = _load()
    w = np.ascontiguousarray(w, np.float64)
    mean = np.ascontiguousarray(mean, np.float64)
    cov = np.ascontiguousarray(cov, np.float64)
    if lib is None:
        from phdslam_tpu.ops.gm import reduce_mixture_np
        return reduce_mixture_np(w, mean, cov, min_distance)
    n, d = mean.shape
    out_w = np.empty_like(w)
    out_mean = np.empty_like(mean)
    out_cov = np.empty_like(cov)
    dp = ctypes.POINTER(ctypes.c_double)
    n_out = lib.gm_reduce(
        w.ctypes.data_as(dp), mean.ctypes.data_as(dp),
        cov.ctypes.data_as(dp), n, d, float(min_distance),
        out_w.ctypes.data_as(dp), out_mean.ctypes.data_as(dp),
        out_cov.ctypes.data_as(dp))
    return out_w[:n_out], out_mean[:n_out], out_cov[:n_out]


def hungarian(cost):
    """Min-cost assignment. cost [m, n] with m <= n. Returns
    (row_to_col [m] int32, total_cost). Falls back to scipy."""
    lib = _load()
    cost = np.ascontiguousarray(cost, np.float64)
    m, n = cost.shape
    if lib is None or m > n:
        from scipy.optimize import linear_sum_assignment
        r, c = linear_sum_assignment(cost)
        return c.astype(np.int32), float(cost[r, c].sum())
    assign = np.full(m, -1, np.int32)
    total = lib.hungarian(
        cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), m, n,
        assign.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return assign, float(total)
