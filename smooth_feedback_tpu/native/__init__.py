"""Native (C++) runtime components.

``qp_solver.cpp`` is a dependency-free embedded implementation of the same
ADMM algorithm as the JAX kernel — the host/robot-CPU deployment counterpart
and a cross-language parity oracle.  It compiles on demand with the system
toolchain and loads through ctypes.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import NamedTuple, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "qp_solver.cpp")
_LIB = os.path.join(_HERE, "_libsfqp.so")

_lib = None


class _SfQpOptions(ctypes.Structure):
    _fields_ = [
        ("alpha", ctypes.c_double),
        ("rho", ctypes.c_double),
        ("sigma", ctypes.c_double),
        ("scaling", ctypes.c_int),
        ("eps_abs", ctypes.c_double),
        ("eps_rel", ctypes.c_double),
        ("eps_primal_inf", ctypes.c_double),
        ("eps_dual_inf", ctypes.c_double),
        ("max_iter", ctypes.c_int),
        ("stop_check_iter", ctypes.c_int),
        ("polish", ctypes.c_int),
        ("polish_iter", ctypes.c_int),
        ("delta", ctypes.c_double),
        ("rho_eq_scale", ctypes.c_double),
        ("adaptive_rho", ctypes.c_int),
        ("adaptive_rho_tol", ctypes.c_double),
    ]


class _SfQpResult(ctypes.Structure):
    _fields_ = [
        ("status", ctypes.c_int),
        ("iters", ctypes.c_int),
        ("objective", ctypes.c_double),
        ("primal_res", ctypes.c_double),
        ("dual_res", ctypes.c_double),
    ]


class NativeQPResult(NamedTuple):
    primal: np.ndarray
    dual: np.ndarray
    status: int
    iters: int
    objective: float
    primal_res: float
    dual_res: float


def _build() -> str:
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
        )
    return _LIB


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.sf_qp_solve.restype = ctypes.c_int
        lib.sf_qp_default_options.argtypes = [ctypes.POINTER(_SfQpOptions)]
        _lib = lib
    return _lib


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def solve_qp_native(
    P,
    q,
    A,
    l,
    u,
    warmstart: Optional[tuple] = None,
    **options,
) -> NativeQPResult:
    """Solve one dense QP with the embedded C++ solver.

    ``options`` override fields of the default parameter set (same names and
    semantics as :class:`smooth_feedback_tpu.qp.QPSolverParams`, including
    the active-set polish, which mirrors the JAX f64 Schur path).
    """
    lib = _load()
    P = np.ascontiguousarray(P, np.float64)
    A = np.ascontiguousarray(A, np.float64)
    q = np.ascontiguousarray(q, np.float64)
    l = np.ascontiguousarray(l, np.float64)
    u = np.ascontiguousarray(u, np.float64)
    m, n = A.shape

    opts = _SfQpOptions()
    lib.sf_qp_default_options(ctypes.byref(opts))
    for k, v in options.items():
        if not hasattr(opts, k):
            raise ValueError(f"unknown option {k!r}")
        setattr(
            opts,
            k,
            int(v)
            if k
            in (
                "scaling",
                "max_iter",
                "stop_check_iter",
                "polish",
                "polish_iter",
                "adaptive_rho",
            )
            else float(v),
        )

    primal = np.zeros(n)
    dual = np.zeros(m)
    if warmstart is not None:
        primal[:] = warmstart[0]
        dual[:] = warmstart[1]
    res = _SfQpResult()

    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.sf_qp_solve(
        n,
        m,
        dptr(P),
        dptr(q),
        dptr(A),
        dptr(l),
        dptr(u),
        ctypes.byref(opts),
        dptr(primal),
        dptr(dual),
        ctypes.byref(res),
    )
    return NativeQPResult(
        primal=primal,
        dual=dual,
        status=int(res.status),
        iters=int(res.iters),
        objective=float(res.objective),
        primal_res=float(res.primal_res),
        dual_res=float(res.dual_res),
    )
