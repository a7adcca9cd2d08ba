"""Batched dense QP solving (L2 numerical kernel layer)."""

from .solver import QPFactors, qp_factorize, solve_qp, solve_qp_batch
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
    "random_qp",
    "warmstart_like",
]
