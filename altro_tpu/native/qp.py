"""ctypes binding for the native C++ ADMM QP solver (qp_solver.cpp).

Compiled on first use with g++ (cached next to the source). No external
dependencies (pybind11 intentionally avoided; plain C ABI + ctypes).
"""
from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "qp_solver.cpp")
_LIB = os.path.join(_DIR, "libaltro_tpu_qp.so")
_lib = None
_build_error: Optional[str] = None


def _build() -> Optional[str]:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, text=True)
        return None
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        return getattr(e, "stderr", str(e)) or str(e)


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return
    if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build_error = _build()
        if _build_error is not None:
            return
    lib = ctypes.CDLL(_LIB)
    lib.altro_tpu_qp_solve.restype = ctypes.c_int
    lib.altro_tpu_qp_solve.argtypes = [
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib


def available() -> bool:
    _load()
    return _lib is not None


@dataclasses.dataclass
class NativeQPSolution:
    x: np.ndarray
    y: np.ndarray
    iterations: int
    r_prim: float
    r_dual: float
    status: int  # 1 converged


def solve_qp(P, q, A, l, u, eps_abs: float = 1e-6,
             max_iter: int = 20000) -> NativeQPSolution:
    _load()
    if _lib is None:
        raise RuntimeError(f"native QP solver unavailable: {_build_error}")
    P = np.ascontiguousarray(P, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    A = np.ascontiguousarray(A, np.float64)
    l = np.ascontiguousarray(np.nan_to_num(l, neginf=-1e30), np.float64)
    u = np.ascontiguousarray(np.nan_to_num(u, posinf=1e30), np.float64)
    nn, mm = P.shape[0], A.shape[0]
    x = np.zeros(nn)
    y = np.zeros(mm)
    iters = ctypes.c_int(0)
    rp = ctypes.c_double(0)
    rd = ctypes.c_double(0)
    dp = ctypes.POINTER(ctypes.c_double)
    ret = _lib.altro_tpu_qp_solve(
        nn, mm, P.ctypes.data_as(dp), q.ctypes.data_as(dp),
        A.ctypes.data_as(dp), l.ctypes.data_as(dp), u.ctypes.data_as(dp),
        eps_abs, max_iter, x.ctypes.data_as(dp), y.ctypes.data_as(dp),
        ctypes.byref(iters), ctypes.byref(rp), ctypes.byref(rd))
    if ret < 0:
        raise RuntimeError("native QP solver: factorization failed")
    return NativeQPSolution(x=x, y=y, iterations=iters.value,
                            r_prim=rp.value, r_dual=rd.value,
                            status=1 if ret == 0 else 0)
