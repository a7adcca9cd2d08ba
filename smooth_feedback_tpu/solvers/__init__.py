"""Native NLP solvers."""

from .sqp import (
    SQPParams,
    rescue_nonoptimal,
    solve_nlp_sqp,
    solve_nlp_sqp_batch,
)

__all__ = [
    "SQPParams",
    "rescue_nonoptimal",
    "solve_nlp_sqp",
    "solve_nlp_sqp_batch",
]
