"""Controllers (L4 layer)."""

from .mpc import MPC, MPCParams, MPCStepResult, MPCWeights, default_weights, make_mpc_step
from .pid import PID, PIDGains, PIDParams, PIDState, pid_gains, pid_init, pid_step

__all__ = [
    "MPC",
    "MPCParams",
    "MPCStepResult",
    "MPCWeights",
    "default_weights",
    "make_mpc_step",
    "PID",
    "PIDGains",
    "PIDParams",
    "PIDState",
    "pid_gains",
    "pid_init",
    "pid_step",
]
