"""Bridge to the official OSQP solver (cf. reference compat/osqp.hpp).

Activates only when the ``osqp`` package is installed (it is not in this
image; the embedded C++ solver in ``smooth_feedback_tpu.native`` and the scipy
bridge serve as the oracles of record here).
"""

from __future__ import annotations

import numpy as np

from ..qp.types import QPSolution, QPSolutionStatus, QPSolverParams, QuadraticProgram


def osqp_available() -> bool:
    try:
        import osqp  # noqa: F401

        return True
    except ImportError:
        return False


def solve_qp_osqp(
    qp: QuadraticProgram,
    prm: QPSolverParams = QPSolverParams(),
    warmstart=None,
):
    """Solve one dense QP with OSQP, mapping parameters like the reference
    (compat/osqp.hpp:51-81: adaptive_rho off, same eps/alpha/rho/sigma)."""
    import osqp
    import scipy.sparse as sp

    P, q, A, l, u = [np.asarray(a, np.float64) for a in qp]
    solver = osqp.OSQP()
    solver.setup(
        P=sp.csc_matrix(np.triu(P)),
        q=q,
        A=sp.csc_matrix(A),
        l=l,
        u=u,
        alpha=prm.alpha,
        rho=prm.rho,
        sigma=prm.sigma,
        scaling=10 if prm.scaling else 0,
        eps_abs=prm.eps_abs,
        eps_rel=prm.eps_rel,
        eps_prim_inf=prm.eps_primal_inf,
        eps_dual_inf=prm.eps_dual_inf,
        max_iter=prm.max_iter,
        check_termination=prm.stop_check_iter,
        polish=prm.polish,
        polish_refine_iter=prm.polish_iter,
        delta=prm.delta,
        adaptive_rho=False,
        scaled_termination=False,
        verbose=False,
    )
    if warmstart is not None:
        solver.warm_start(x=np.asarray(warmstart.primal), y=np.asarray(warmstart.dual))
    res = solver.solve()

    status_map = {
        "solved": QPSolutionStatus.Optimal,
        "solved inaccurate": QPSolutionStatus.Optimal,
        "primal infeasible": QPSolutionStatus.PrimalInfeasible,
        "dual infeasible": QPSolutionStatus.DualInfeasible,
        "maximum iterations reached": QPSolutionStatus.MaxIterations,
        "run time limit reached": QPSolutionStatus.MaxTime,
    }
    status = status_map.get(res.info.status, QPSolutionStatus.Unknown)
    return QPSolution(
        primal=np.asarray(res.x),
        dual=np.asarray(res.y),
        status=np.int32(int(status)),
        iters=np.int32(res.info.iter),
        objective=np.float64(res.info.obj_val),
        primal_res=np.float64(res.info.pri_res),
        dual_res=np.float64(res.info.dua_res),
    )
