"""Controllers (L4 layer)."""

from .pid import PID, PIDGains, PIDParams, PIDState, pid_gains, pid_init, pid_step

__all__ = [
    "PID",
    "PIDGains",
    "PIDParams",
    "PIDState",
    "pid_gains",
    "pid_init",
    "pid_step",
]
