"""ctypes binding to the native dense QP oracle (native/qp_oracle.cpp).

The shared library is compiled on demand with the system g++ and cached next
to the source.  Used by the test-suite as an independent cross-check of the
JAX ADMM kernel (the role MATLAB plays for the reference, SURVEY §4), and
usable as a host-side fallback solver for small one-off problems.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import NamedTuple, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_SRC = os.path.join(_NATIVE_DIR, "qp_oracle.cpp")
_SO = os.path.join(_NATIVE_DIR, "libqp_oracle.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


class OracleSolution(NamedTuple):
    x: np.ndarray
    y: np.ndarray
    status: int
    iters: int


def _build() -> str:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         _SRC, "-o", _SO],
        check=True,
        capture_output=True,
    )
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is None:
            lib = ctypes.CDLL(_build())
            dp = ctypes.POINTER(ctypes.c_double)
            lib.qp_solve_dense.restype = ctypes.c_int
            lib.qp_solve_dense.argtypes = [
                ctypes.c_int, ctypes.c_int,  # n, m
                dp, dp, dp, dp, dp,  # P, A, q, l, u
                ctypes.c_double, ctypes.c_double, ctypes.c_double,  # rho, sigma, alpha
                ctypes.c_int,  # max_iter
                ctypes.c_double, ctypes.c_double,  # eps_abs, eps_rel
                ctypes.c_int, ctypes.c_int,  # check_every, polish
                dp, dp, ctypes.POINTER(ctypes.c_int),  # x, y, iters
            ]
            _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def solve(
    P: np.ndarray,
    A: np.ndarray,
    q: np.ndarray,
    l: np.ndarray,
    u: np.ndarray,
    rho: float = 0.1,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    max_iter: int = 4000,
    eps_abs: float = 1e-8,
    eps_rel: float = 1e-8,
    check_every: int = 25,
    polish: bool = True,
) -> OracleSolution:
    """Solve one dense QP with the native oracle (double precision)."""
    lib = _load()
    P = np.ascontiguousarray(P, dtype=np.float64)
    A = np.ascontiguousarray(A, dtype=np.float64)
    q = np.ascontiguousarray(q, dtype=np.float64)
    l = np.ascontiguousarray(l, dtype=np.float64)
    u = np.ascontiguousarray(u, dtype=np.float64)
    n, m = P.shape[0], A.shape[0]
    x = np.zeros(n)
    y = np.zeros(m)
    iters = ctypes.c_int(0)
    dp = ctypes.POINTER(ctypes.c_double)
    as_p = lambda a: a.ctypes.data_as(dp)
    status = lib.qp_solve_dense(
        n, m, as_p(P), as_p(A), as_p(q), as_p(l), as_p(u),
        rho, sigma, alpha, max_iter, eps_abs, eps_rel,
        check_every, int(polish), as_p(x), as_p(y),
        ctypes.byref(iters),
    )
    return OracleSolution(x=x, y=y, status=int(status), iters=int(iters.value))
