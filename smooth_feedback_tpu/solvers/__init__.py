"""Native NLP solvers."""

# Fully initialize the ocp package FIRST: sqp imports ocp.nlp, and
# ocp.solve imports back from solvers.sqp.  If sqp's import is the one that
# triggers ocp/__init__, ocp.solve finds solvers.sqp partially initialized
# (circular-import ImportError for any user who imports solvers before ocp).
# With this pre-import, ocp.solve's import of solvers.sqp loads sqp cleanly
# (ocp.nlp is already in sys.modules at that point — ocp/__init__ imports
# .nlp before .solve).
from .. import ocp as _ocp  # noqa: F401
from .sqp import SQPParams, solve_nlp_sqp, solve_nlp_sqp_batch

__all__ = ["SQPParams", "solve_nlp_sqp", "solve_nlp_sqp_batch"]
