"""Optimal control: problem types, collocation, transcription."""

from . import collocation
from .ocp import OCP, OCPSolution, test_ocp_derivatives
from .to_qp import body_velocity, ocp_to_qp, qpsol_to_ocpsol, variable_layout

__all__ = [
    "collocation",
    "OCP",
    "OCPSolution",
    "test_ocp_derivatives",
    "ocp_to_qp",
    "qpsol_to_ocpsol",
    "variable_layout",
    "body_velocity",
]
