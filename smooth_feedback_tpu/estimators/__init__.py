"""State estimators (L4 layer)."""

from .ekf import EKF, EKFState, ekf_predict, ekf_reset, ekf_update

__all__ = ["EKF", "EKFState", "ekf_predict", "ekf_reset", "ekf_update"]
