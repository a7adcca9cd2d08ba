"""Flattening tests (mirroring reference tests/test_ocp_flatten.cpp): the flat
dynamics must exactly describe the evolution of the tangent deviation, and
flat cost/constraints must be compositions with rplus."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.groups import SE2, SO3, Bundle, Rn
from smooth_feedback_tpu.ocp import OCP, flatten_ocp
from smooth_feedback_tpu.ocp.flatten import unflatten_ocpsol
from smooth_feedback_tpu.ocp.ocp import OCPSolution


def _se2_ocp():
    X, U = SE2, Rn(2)
    return OCP(
        X=X,
        U=U,
        theta=lambda tf, x0, xf, q: tf + q[0],
        f=lambda t, x, u: jnp.stack([u[0], jnp.zeros(()), u[1]]),
        g=lambda t, x, u: jnp.array([0.5 * (u @ u)]),
        cr=lambda t, x, u: u,
        crl=jnp.array([-1.0, -1.0]),
        cru=jnp.array([1.0, 1.0]),
        ce=lambda tf, x0, xf, q: jnp.concatenate([tf[None], SE2.log(x0)]),
        cel=jnp.zeros(4),
        ceu=jnp.zeros(4),
    )


@pytest.mark.parametrize("Gname", ["SE2", "SO3", "Bundle"])
def test_flat_dynamics_consistency(Gname):
    """For a simulated trajectory x(t) with d^r x = f, the deviation
    e(t) = x(t) (-) xl(t) must satisfy de/dt = f_flat(t, e, v)."""
    G = {"SE2": SE2, "SO3": SO3, "Bundle": Bundle(SE2, Rn(2))}[Gname]
    nx = G.ndof
    U = Rn(2)

    key = jax.random.PRNGKey(7)
    k1, k2, k3 = jax.random.split(key, 3)
    Wx = jax.random.normal(k1, (nx, 2))
    wv = jax.random.normal(k2, (nx,))

    def f(t, x, u):
        # state- and input-dependent smooth dynamics
        return 0.3 * jnp.sin(G.log(x)) + Wx @ u + 0.2 * wv * jnp.cos(t)

    ocp = OCP(
        X=G, U=U,
        theta=lambda tf, x0, xf, q: q[0],
        f=f,
        g=lambda t, x, u: jnp.array([u @ u]),
        cr=lambda t, x, u: u,
        crl=-jnp.ones(2), cru=jnp.ones(2),
        ce=lambda tf, x0, xf, q: jnp.zeros(1),
        cel=jnp.zeros(1), ceu=jnp.zeros(1),
    )

    # nominal trajectory: screw motion; input trajectory: sinusoid
    twist = 0.4 * jax.random.normal(k3, (nx,))
    xl_fun = lambda t: G.exp(t * twist)
    ul_fun = lambda t: jnp.stack([0.1 * jnp.sin(t), 0.2 * jnp.cos(t)])

    flat = flatten_ocp(ocp, xl_fun, ul_fun)

    # simulate x(t) with RK4 from a perturbed start, track e(t) = x (-) xl
    dt = 1e-3
    x = G.rplus(xl_fun(0.0), jnp.array([0.2, -0.1, 0.15, 0.05, -0.2, 0.1][:nx]))
    t = 0.0
    for _ in range(100):
        u = ul_fun(t)
        k1_ = f(t, x, u)
        k2_ = f(t + dt / 2, G.rplus(x, dt / 2 * k1_), u)
        k3_ = f(t + dt / 2, G.rplus(x, dt / 2 * k2_), u)
        k4_ = f(t + dt, G.rplus(x, dt * k3_), u)
        x = G.rplus(x, dt / 6 * (k1_ + 2 * k2_ + 2 * k3_ + k4_))
        t += dt

    e = G.rminus(x, xl_fun(t))
    v = jnp.zeros(2)

    # finite-difference de/dt vs flat dynamics
    x2 = x
    tt = t
    for _ in range(2):
        u = ul_fun(tt)
        k1_ = f(tt, x2, u)
        k2_ = f(tt + dt / 2, G.rplus(x2, dt / 2 * k1_), u)
        k3_ = f(tt + dt / 2, G.rplus(x2, dt / 2 * k2_), u)
        k4_ = f(tt + dt, G.rplus(x2, dt * k3_), u)
        x2 = G.rplus(x2, dt / 6 * (k1_ + 2 * k2_ + 2 * k3_ + k4_))
        tt += dt
    e2 = G.rminus(x2, xl_fun(tt))
    de_fd = (e2 - e) / (2 * dt)

    de_flat = flat.f(jnp.asarray(t + dt), G.rminus(x, xl_fun(t)) * 0 + e, v * 0)
    # evaluate flat dynamics at midpoint time with e at t (first order ok)
    de_flat = flat.f(jnp.asarray(t), e, jnp.zeros(2))
    np.testing.assert_allclose(de_flat, de_fd, atol=5e-3, rtol=1e-2)


def test_flat_composition():
    """Flat cost/constraints are compositions with rplus around the nominal."""
    ocp = _se2_ocp()
    xl = lambda t: SE2.exp(t * jnp.array([1.0, 0.0, 0.5]))
    ul = lambda t: jnp.full(2, 0.01)
    flat = flatten_ocp(ocp, xl, ul)

    e = jnp.array([0.1, -0.2, 0.3])
    v = jnp.array([0.05, -0.04])
    t = jnp.asarray(0.7)
    tf = jnp.asarray(2.0)
    q = jnp.array([1.5])

    np.testing.assert_allclose(
        flat.g(t, e, v), ocp.g(t, SE2.rplus(xl(t), e), ul(t) + v), atol=1e-12
    )
    np.testing.assert_allclose(
        flat.cr(t, e, v), ocp.cr(t, SE2.rplus(xl(t), e), ul(t) + v), atol=1e-12
    )
    e0, ef = jnp.zeros(3), e
    np.testing.assert_allclose(
        flat.theta(tf, e0, ef, q),
        ocp.theta(tf, SE2.rplus(xl(0.0), e0), SE2.rplus(xl(tf), ef), q),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        flat.ce(tf, e0, ef, q),
        ocp.ce(tf, SE2.rplus(xl(0.0), e0), SE2.rplus(xl(tf), ef), q),
        atol=1e-12,
    )


def test_flat_dynamics_at_zero():
    """At e = 0, v = 0 the flat dynamics equal f - dxl (the defect of the
    nominal)."""
    ocp = _se2_ocp()
    twist = jnp.array([1.0, 0.0, 0.5])
    xl = lambda t: SE2.exp(t * twist)
    ul = lambda t: jnp.zeros(2)
    flat = flatten_ocp(ocp, xl, ul)

    t = jnp.asarray(0.3)
    de = flat.f(t, jnp.zeros(3), jnp.zeros(2))
    f_nom = ocp.f(t, xl(t), ul(t))
    np.testing.assert_allclose(de, f_nom - twist, atol=1e-10)


def test_unflatten_roundtrip():
    ocp = _se2_ocp()
    xl = lambda t: SE2.exp(t * jnp.array([1.0, 0.0, 0.5]))
    ul = lambda t: jnp.zeros(2)

    e_traj = lambda t: jnp.array([0.1 * t, 0.0, -0.05 * t])
    v_traj = lambda t: jnp.array([0.01, 0.02]) * t
    flatsol = OCPSolution(t0=0.0, tf=jnp.asarray(2.0), x=e_traj, u=v_traj)
    sol = unflatten_ocpsol(flatsol, ocp, xl, ul)

    t = jnp.asarray(1.2)
    np.testing.assert_allclose(
        sol.x(t), SE2.rplus(xl(t), e_traj(t)), atol=1e-12
    )
    np.testing.assert_allclose(sol.u(t), v_traj(t), atol=1e-12)


def test_derivative_self_check_on_flat_ocp():
    """test_ocp_derivatives with Hessian verification, run TWICE on both the
    original and the flattened SE(2) OCP (reference pattern:
    tests/test_ocp_flatten.cpp:53-59 runs the check twice to catch state)."""
    from smooth_feedback_tpu.ocp.ocp import test_ocp_derivatives

    ocp = _se2_ocp()
    xl = lambda t: SE2.exp(jnp.array([1.0, 0.0, 0.5]) * t)
    ul = lambda t: 0.1 * jnp.ones(2)
    flat = flatten_ocp(ocp, xl, ul)
    for probe in (ocp, flat):
        test_ocp_derivatives(probe, jax.random.PRNGKey(5), num=2)
        test_ocp_derivatives(probe, jax.random.PRNGKey(5), num=2)


def test_derivative_self_check_catches_bad_hessian():
    """A cost whose first derivative is right but second derivative is wrong
    (a custom_jvp rule that hides curvature) must be flagged — this is the
    class of bug the first-order-only round-1 check could not see."""
    from smooth_feedback_tpu.ocp.ocp import test_ocp_derivatives

    @jax.custom_jvp
    def cube(x):
        return x**3

    @cube.defjvp
    def _cube_jvp(primals, tangents):
        (x,), (dx,) = primals, tangents
        # first-order value correct; stop_gradient hides the curvature from
        # a second forward sweep, so the autodiff Hessian is 0 instead of 6x
        return x**3, 3.0 * jax.lax.stop_gradient(x) ** 2 * dx

    ocp = _se2_ocp()._replace(g=lambda t, x, u: jnp.array([cube(u[0]) + u @ u]))
    with pytest.raises(AssertionError):
        test_ocp_derivatives(ocp, jax.random.PRNGKey(5), num=3)
