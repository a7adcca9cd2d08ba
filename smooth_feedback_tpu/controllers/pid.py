"""PID controller on Lie groups.

TPU-native functional re-design of the reference PID (pid.hpp:37-204): the
controller state (last time + integral error) is an explicit pytree, the step
is a pure function, so fleets of controllers batch with ``jax.vmap`` and the
whole control loop can live inside one jit/scan.

The controlled system model is the Lie-group double integrator

    d^r x_t = v,    dv/dt = u,

and the control law (pid.hpp:74-87) is

    u = a_des + kp . (x_des (-) x) + kd . (v_des - v) + ki . integral_err
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..groups.base import LieGroup


@dataclasses.dataclass(frozen=True)
class PIDParams:
    """cf. reference PIDParams (pid.hpp:17-21)."""

    windup_limit: float = float("inf")


class PIDState(NamedTuple):
    """Integral state; ``t_last = nan`` means "no previous sample"."""

    t_last: jax.Array  # scalar
    i_err: jax.Array  # (ndof,)


class PIDGains(NamedTuple):
    """Per-axis gains as tangent-space vectors (pid.hpp:192-194)."""

    kp: jax.Array  # (ndof,)
    kd: jax.Array  # (ndof,)
    ki: jax.Array  # (ndof,)


def pid_init(G: LieGroup, dtype=None) -> PIDState:
    return PIDState(
        t_last=jnp.asarray(jnp.nan, dtype), i_err=jnp.zeros((G.ndof,), dtype)
    )


def pid_gains(G: LieGroup, kp=1.0, kd=1.0, ki=0.0, dtype=None) -> PIDGains:
    ones = jnp.ones((G.ndof,), dtype)
    return PIDGains(kp=kp * ones, kd=kd * ones, ki=ki * ones)


def pid_step(
    G: LieGroup,
    params: PIDParams,
    gains: PIDGains,
    state: PIDState,
    t,
    x: jax.Array,
    v: jax.Array,
    x_des: jax.Array,
    v_des: jax.Array,
    a_des: jax.Array,
) -> Tuple[jax.Array, PIDState]:
    """One PID step; returns ``(u, new_state)`` (cf. PID::operator(),
    pid.hpp:74-87).

    ``x_des``/``v_des``/``a_des`` are the desired state, body velocity, and
    body acceleration at time ``t`` (the reference's trajectory functor output,
    pid.hpp:43).
    """
    t = jnp.asarray(t, dtype=state.i_err.dtype)
    g_err = G.rminus(x_des, x)

    # integral state update with windup clamp (pid.hpp:79-84); skipped on the
    # first call (t_last = nan) and for non-increasing time.
    do_int = jnp.logical_and(jnp.logical_not(jnp.isnan(state.t_last)), t > state.t_last)
    i_new = state.i_err + (t - jnp.where(do_int, state.t_last, t)) * g_err
    i_new = jnp.clip(i_new, -params.windup_limit, params.windup_limit)
    i_err = jnp.where(do_int, i_new, state.i_err)

    u = a_des + gains.kp * g_err + gains.kd * (v_des - v) + gains.ki * i_err
    return u, PIDState(t_last=t, i_err=i_err)


class PID:
    """Stateful convenience wrapper mirroring the reference class API
    (pid.hpp:39).  For batched/jitted pipelines prefer ``pid_step``."""

    def __init__(self, G: LieGroup, params: PIDParams = PIDParams(), dtype=None):
        self.G = G
        self.params = params
        self.gains = pid_gains(G, dtype=dtype)
        self.state = pid_init(G, dtype=dtype)
        self._xdes: Callable = lambda t: (
            G.identity(dtype),
            jnp.zeros((G.ndof,), dtype),
            jnp.zeros((G.ndof,), dtype),
        )

    def set_kp(self, kp):
        self.gains = self.gains._replace(kp=jnp.broadcast_to(jnp.asarray(kp), (self.G.ndof,)))

    def set_kd(self, kd):
        self.gains = self.gains._replace(kd=jnp.broadcast_to(jnp.asarray(kd), (self.G.ndof,)))

    def set_ki(self, ki):
        self.gains = self.gains._replace(ki=jnp.broadcast_to(jnp.asarray(ki), (self.G.ndof,)))

    def reset_integral(self):
        self.state = self.state._replace(i_err=jnp.zeros_like(self.state.i_err))

    def set_xdes(self, f: Callable):
        """``f(t) -> (x_des, v_des, a_des)`` (cf. pid.hpp:177-186)."""
        self._xdes = f

    def __call__(self, t, x, v):
        x_des, v_des, a_des = self._xdes(t)
        u, self.state = pid_step(
            self.G, self.params, self.gains, self.state, t, x, v, x_des, v_des, a_des
        )
        return u
