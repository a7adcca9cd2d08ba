"""Native NLP solvers."""

from .sqp import SQPParams, solve_nlp_sqp, solve_nlp_sqp_batch

__all__ = ["SQPParams", "solve_nlp_sqp", "solve_nlp_sqp_batch"]
