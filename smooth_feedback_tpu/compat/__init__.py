"""Bridges to external solvers (validation oracles).

The reference bridges to OSQP and Ipopt (compat/osqp.hpp, compat/ipopt.hpp);
in this image neither is installed, so the scipy bridge is the oracle of
record, and the osqp/ipopt bridges activate when those packages exist.
"""

from .scipy_nlp import solve_nlp_scipy

__all__ = ["solve_nlp_scipy"]
