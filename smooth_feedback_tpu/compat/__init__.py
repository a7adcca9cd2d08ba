"""Bridges to external solvers (validation oracles).

The reference bridges to OSQP and Ipopt (compat/osqp.hpp, compat/ipopt.hpp);
in this image neither is installed, so the scipy bridge is the oracle of
record, and the osqp/ipopt bridges activate when those packages exist.
"""

from .ipopt_bridge import ipopt_available, solve_nlp_ipopt
from .osqp_bridge import osqp_available, solve_qp_osqp
from .scipy_nlp import solve_nlp_scipy

__all__ = [
    "solve_nlp_scipy",
    "osqp_available",
    "solve_qp_osqp",
    "ipopt_available",
    "solve_nlp_ipopt",
]
