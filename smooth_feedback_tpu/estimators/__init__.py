"""State estimators (L4 layer)."""

from .ekf import (
    EKF,
    EKFFleetState,
    EKFState,
    SqrtEKFState,
    ekf_fleet_predict,
    ekf_fleet_reset,
    ekf_fleet_states,
    ekf_fleet_update,
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
    "EKFFleetState",
    "EKFState",
    "SqrtEKFState",
    "ekf_fleet_predict",
    "ekf_fleet_reset",
    "ekf_fleet_states",
    "ekf_fleet_update",
    "ekf_predict",
    "ekf_reset",
    "ekf_update",
    "ekf_update_iterated",
    "sqrt_ekf_predict",
    "sqrt_ekf_reset",
    "sqrt_ekf_update",
]
