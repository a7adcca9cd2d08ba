"""Utilities: bounds sets, Lie-group splines, derivative helpers."""

from .bounds import ManifoldBounds, box_bounds, empty_bounds
from .cache import enable_compilation_cache
from .flops import (
    admm_check_flops,
    admm_factor_flops,
    admm_iter_flops,
    condensed_mpc_transcribe_flops,
    device_peak_flops,
    mfu_pct,
    qp_solve_flops,
)
from .linalg import d2r_fog
from .spline import LieSpline, fit_spline, spline_eval, spline_pos

__all__ = [
    "ManifoldBounds",
    "enable_compilation_cache",
    "box_bounds",
    "empty_bounds",
    "LieSpline",
    "fit_spline",
    "spline_eval",
    "spline_pos",
    "d2r_fog",
    "admm_iter_flops",
    "admm_factor_flops",
    "admm_check_flops",
    "qp_solve_flops",
    "condensed_mpc_transcribe_flops",
    "device_peak_flops",
    "mfu_pct",
]
