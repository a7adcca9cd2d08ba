"""Batched dense QP solving (L2 numerical kernel layer)."""

from .solver import (
    QPFactors,
    qp_factorize,
    qp_phase_timings,
    solve_qp,
    solve_qp_batch,
    solve_qp_timed,
)
from .types import (
    QPSolution,
    QPSolutionStatus,
    QPSolverParams,
    QuadraticProgram,
    random_qp,
    warmstart_like,
)

__all__ = [
    "QuadraticProgram",
    "QPSolution",
    "QPSolutionStatus",
    "QPSolverParams",
    "solve_qp",
    "qp_factorize",
    "QPFactors",
    "solve_qp_batch",
    "solve_qp_timed",
    "qp_phase_timings",
    "random_qp",
    "warmstart_like",
]
