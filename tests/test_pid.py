"""PID controller tests (mirroring reference tests/test_pid.cpp) plus a
closed-loop convergence test on the Lie-group double integrator."""

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.controllers import (
    PID,
    PIDParams,
    pid_gains,
    pid_init,
    pid_step,
)
from smooth_feedback_tpu.groups import SE2


def test_basic_and_integral():
    """At the setpoint with zero velocity, u = 0; after error accumulates the
    integral term kicks in; reset_integral clears it (test_pid.cpp:36-63)."""
    pid = PID(SE2)
    pid.set_kp(1.0)
    pid.set_kd(1.0)
    pid.set_ki(1.0)

    u = pid(5.0, SE2.identity(), jnp.zeros(3))
    assert float(jnp.sum(u**2)) < 1e-10

    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    pid(6.0, SE2.random(k1), jnp.zeros(3))
    pid(7.0, SE2.random(k2), jnp.zeros(3))

    u = pid(8.0, SE2.identity(), jnp.zeros(3))
    assert float(jnp.sum(u**2)) > 1e-10  # integral error persists

    pid.reset_integral()
    u = pid(9.0, SE2.identity(), jnp.zeros(3))
    assert float(jnp.sum(u**2)) < 1e-10


def test_tracking_law():
    """u = a_des + kd (v_des - v) + kp (g_des - g) for a desired trajectory
    (test_pid.cpp:66-97)."""
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    g_des = SE2.random(k1)
    v_des = jax.random.normal(k2, (3,))
    a_des = jax.random.normal(k3, (3,))
    g = SE2.random(k4)
    v = jax.random.normal(k5, (3,))

    gains = pid_gains(SE2, kp=2.0, kd=3.0, ki=0.0)
    state = pid_init(SE2)
    u, _ = pid_step(SE2, PIDParams(), gains, state, 1.0, g, v, g_des, v_des, a_des)

    expected = a_des + 3.0 * (v_des - v) + 2.0 * SE2.rminus(g_des, g)
    np.testing.assert_allclose(u, expected, atol=1e-12)


def test_windup_clamp():
    gains = pid_gains(SE2, kp=0.0, kd=0.0, ki=1.0)
    prm = PIDParams(windup_limit=0.05)
    state = pid_init(SE2)
    g_des = SE2.exp(jnp.array([10.0, 0.0, 0.0]))
    # accumulate 1 second of large error -> clamped at windup_limit
    _, state = pid_step(SE2, prm, gains, state, 0.0, SE2.identity(), jnp.zeros(3), g_des, jnp.zeros(3), jnp.zeros(3))
    u, state = pid_step(SE2, prm, gains, state, 1.0, SE2.identity(), jnp.zeros(3), g_des, jnp.zeros(3), jnp.zeros(3))
    assert float(jnp.max(jnp.abs(state.i_err))) <= 0.05 + 1e-12
    np.testing.assert_allclose(u, state.i_err, atol=1e-12)


def test_closed_loop_converges_scan():
    """PID closed loop on the SE(2) double integrator inside lax.scan reaches
    the setpoint."""
    gains = pid_gains(SE2, kp=4.0, kd=4.0, ki=0.0)
    prm = PIDParams()
    x_des = SE2.exp(jnp.array([1.0, -0.5, 0.7]))
    dt = 0.02

    def body(carry, i):
        x, v, st = carry
        u, st = pid_step(
            SE2, prm, gains, st, i * dt, x, v, x_des, jnp.zeros(3), jnp.zeros(3)
        )
        v = v + dt * u
        x = SE2.rplus(x, dt * v)
        return (x, v, st), None

    init = (SE2.identity(), jnp.zeros(3), pid_init(SE2))
    (xf, vf, _), _ = jax.lax.scan(body, init, jnp.arange(1000))
    np.testing.assert_allclose(SE2.rminus(xf, x_des), np.zeros(3), atol=1e-3)
    np.testing.assert_allclose(vf, np.zeros(3), atol=1e-3)
