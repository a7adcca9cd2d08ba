"""Native NLP solvers."""

from .sqp import SQPParams, solve_nlp_sqp

__all__ = ["SQPParams", "solve_nlp_sqp"]
