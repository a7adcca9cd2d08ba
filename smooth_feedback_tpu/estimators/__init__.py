"""State estimators (L4 layer)."""

from .ekf import (
    EKF,
    EKFState,
    SqrtEKFState,
    ekf_predict,
    ekf_reset,
    ekf_update,
    ekf_update_iterated,
    sqrt_ekf_predict,
    sqrt_ekf_reset,
    sqrt_ekf_update,
)

__all__ = [
    "EKF",
    "EKFState",
    "SqrtEKFState",
    "ekf_predict",
    "ekf_reset",
    "ekf_update",
    "ekf_update_iterated",
    "sqrt_ekf_predict",
    "sqrt_ekf_reset",
    "sqrt_ekf_update",
]
