"""ASIF tests (mirroring reference tests/test_asif.cpp): QP block layout,
filter smoke on SO(3), and a closed-loop safety enforcement run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.controllers.asif import (
    ASIFilter,
    ASIFilterParams,
    ASIFtoQPParams,
    asif_to_qp,
    make_asif_step,
)
from smooth_feedback_tpu.groups import SE2, SO3, Rn
from smooth_feedback_tpu.qp import QPSolutionStatus, QPSolverParams
from smooth_feedback_tpu.utils.bounds import ManifoldBounds

inf = np.inf


def test_qp_structure():
    """QP block layout (reference test_asif.cpp:37-95)."""
    K, Nu, Nh = 3, 2, 2
    X, U = SE2, Rn(2)
    f = lambda x, u: jnp.stack([u[0], jnp.zeros(()), u[1]])
    h = lambda t, x: x[:2]  # position components
    bu = lambda t, x: jnp.array([-0.1, 1.0])

    key = jax.random.PRNGKey(1)
    x0 = SE2.random(key, 0.5)
    u_des = jnp.array([0.5, 0.5])
    ulim = ManifoldBounds(
        A=jnp.eye(2), c=jnp.zeros(2), l=jnp.array([-1.0, -1.0]), u=jnp.array([1.0, 1.0])
    )
    prm = ASIFtoQPParams(K=K)

    qp = asif_to_qp(X, U, prm, 1.0, x0, u_des, jnp.ones(2), ulim, f, h, bu)

    niq = 2
    assert qp.P.shape == (Nu + 1, Nu + 1)
    assert qp.q.shape == (Nu + 1,)
    assert qp.A.shape == (Nh * K + niq + 1, Nu + 1)

    A = np.asarray(qp.A)
    np.testing.assert_allclose(A[: Nh * K, Nu], 1.0)  # relaxation column
    np.testing.assert_allclose(A[Nh * K : Nh * K + niq, :Nu], np.eye(2))
    np.testing.assert_allclose(A[Nh * K + niq], [0, 0, 1])

    unp = np.asarray(qp.u)
    lnp = np.asarray(qp.l)
    assert np.all(unp[: Nh * K] == inf)
    np.testing.assert_allclose(lnp[Nh * K : Nh * K + niq], np.asarray(ulim.l - u_des))
    np.testing.assert_allclose(unp[Nh * K : Nh * K + niq], np.asarray(ulim.u - u_des))
    assert lnp[-1] == 0 and unp[-1] == inf


def test_so3_filter_smoke():
    """SO(3) filter solves to optimality (reference test_asif.cpp:100-130)."""
    X, U = SO3, Rn(3)
    f = lambda x, u: u
    h = lambda t, x: SO3.log(x)
    bu = lambda t, x: jnp.array([1.0, 1.0, 1.0])

    asif = ASIFilter(
        X, U, f, h, bu,
        params=ASIFilterParams(T=1.0, asif=ASIFtoQPParams(K=100, dt=0.01)),
    )
    g = SO3.random(jax.random.PRNGKey(2), 0.5)
    u, code = asif(g, jnp.zeros(3))
    assert code == QPSolutionStatus.Optimal


def test_closed_loop_safety():
    """1-D double integrator with barrier h = position: the filter keeps the
    state in the safe set {p >= 0} while the desired input pushes out."""
    X, U = Rn(2), Rn(1)  # (p, v)
    f = lambda x, u: jnp.stack([x[1], u[0]])
    # lookahead barrier (relative degree 1 in u): h = p + 0.5 v
    h = lambda t, x: jnp.stack([x[0] + 0.5 * x[1]])
    # backup: brake hard
    bu = lambda t, x: jnp.array([2.0])

    step, ws0 = make_asif_step(
        X, U, f, h, bu,
        params=ASIFilterParams(
            T=2.0,
            asif=ASIFtoQPParams(K=20, alpha=2.0, dt=0.05, relax_cost=1000.0),
        ),
        W_u=jnp.ones(1),
    )

    dt = 0.02
    def body(carry, i):
        x, ws = carry
        u_des = jnp.array([-1.0])  # push toward the unsafe region
        res = step(ws, x, u_des)
        x = x + dt * f(x, res.u)
        return (x, res.warmstart), (x, res.status)

    x0 = jnp.array([1.0, 0.0])
    (_, _), (xs, statuses) = jax.lax.scan(body, (x0, ws0), jnp.arange(300))
    xs = np.asarray(xs)
    hvals = xs[:, 0] + 0.5 * xs[:, 1]
    assert hvals.min() > -0.05, f"barrier violated: min h = {hvals.min()}"
    assert xs[:, 0].min() > -0.05, f"position violated: min p = {xs[:, 0].min()}"
    # without the filter the trajectory leaves the safe set decisively
    x = np.array([1.0, 0.0])
    for _ in range(300):
        x = x + dt * np.array([x[1], -1.0])
    assert x[0] < -5


def test_vmap_fleet():
    X, U = Rn(2), Rn(1)
    f = lambda x, u: jnp.stack([x[1], u[0]])
    h = lambda t, x: jnp.stack([x[0]])
    bu = lambda t, x: jnp.array([1.0])
    step, ws0 = make_asif_step(
        X, U, f, h, bu, params=ASIFilterParams(T=1.0, asif=ASIFtoQPParams(K=5))
    )
    B = 8
    xs = jnp.stack([jnp.array([1.0 + 0.1 * i, -0.2]) for i in range(B)])
    uds = jnp.zeros((B, 1))
    wss = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), ws0)
    res = jax.jit(jax.vmap(step))(wss, xs, uds)
    assert res.u.shape == (B, 1)
    assert np.all(np.asarray(res.status) == QPSolutionStatus.Optimal)


def test_fleet_matches_vmap():
    """step.fleet (one batched solve) matches the naive vmapped step — same
    statuses and filtered inputs (the batched path keeps the solver's
    scalar-driven iteration control; results must be identical up to solver
    tolerance)."""
    X, U = Rn(2), Rn(1)
    f = lambda x, u: jnp.stack([x[1], u[0]])
    h = lambda t, x: jnp.stack([x[0]])
    bu = lambda t, x: jnp.array([1.0])
    step, ws0 = make_asif_step(
        X, U, f, h, bu,
        params=ASIFilterParams(
            T=1.0, asif=ASIFtoQPParams(K=5),
            qp=QPSolverParams(eps_abs=1e-8, eps_rel=1e-8),
        ),
    )
    B = 8
    xs = jnp.stack([jnp.array([1.0 + 0.1 * i, -0.2]) for i in range(B)])
    uds = jnp.zeros((B, 1))
    wss = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), ws0)
    r_vmap = jax.jit(jax.vmap(step))(wss, xs, uds)
    r_fleet = jax.jit(step.fleet)(wss, xs, uds)
    assert np.all(np.asarray(r_fleet.status) == QPSolutionStatus.Optimal)
    np.testing.assert_array_equal(
        np.asarray(r_fleet.status), np.asarray(r_vmap.status)
    )
    np.testing.assert_allclose(
        np.asarray(r_fleet.u), np.asarray(r_vmap.u), atol=1e-6
    )


def test_fleet_lane_adaptive_matches_xla():
    """The lane backend + adaptive rho (the ASIF fleet bench configuration)
    filters identically to the default XLA backend at tight tolerance."""
    X, U = Rn(2), Rn(1)
    f = lambda x, u: jnp.stack([x[1], u[0]])
    h = lambda t, x: jnp.stack([x[0]])
    bu = lambda t, x: jnp.array([1.0])

    def build(backend, adaptive):
        return make_asif_step(
            X, U, f, h, bu,
            params=ASIFilterParams(
                T=1.0, asif=ASIFtoQPParams(K=5),
                qp=QPSolverParams(
                    eps_abs=1e-8, eps_rel=1e-8, backend=backend,
                    adaptive_rho=adaptive, polish=False, max_iter=20000,
                ),
            ),
        )

    step_x, ws0 = build("xla", False)
    step_l, _ = build("lane", True)
    B = 8
    xs = jnp.stack([jnp.array([1.0 + 0.1 * i, -0.2]) for i in range(B)])
    uds = jnp.zeros((B, 1))
    wss = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), ws0)
    r_x = jax.jit(step_x.fleet)(wss, xs, uds)
    r_l = jax.jit(step_l.fleet)(wss, xs, uds)
    assert np.all(np.asarray(r_x.status) == QPSolutionStatus.Optimal)
    assert np.all(np.asarray(r_l.status) == QPSolutionStatus.Optimal)
    np.testing.assert_allclose(np.asarray(r_l.u), np.asarray(r_x.u), atol=1e-6)


def test_fleet_transcription_matches_vmap():
    """asif_to_qp_fleet (batch-trailing sensitivity propagation) produces
    the same QPs as jax.vmap(asif_to_qp) to fp tolerance."""
    from smooth_feedback_tpu.controllers.asif import asif_to_qp_fleet

    X, U = SE2, Rn(2)
    f = lambda x, u: jnp.stack([u[0], 0.1 * x[1], u[1]])
    h = lambda t, x: jnp.stack([x[0] + 0.2 * t, 2.0 - x[1]])
    bu = lambda t, x: jnp.stack([0.3 * x[1], -0.4 * jnp.ones(())])
    prm = ASIFtoQPParams(K=7, dt=0.07, alpha=1.5, relax_cost=200.0)
    W_u = jnp.array([2.0, 1.0])
    ulim = ManifoldBounds(
        A=jnp.eye(2), c=jnp.zeros(2),
        l=jnp.array([-0.3, -0.6]), u=jnp.array([0.4, 0.6]),
    )
    B = 6
    keys = jax.random.split(jax.random.PRNGKey(31), B)
    xs = jax.vmap(lambda k: SE2.exp(0.4 * jax.random.normal(k, (3,))))(keys)
    uds = 0.2 * jax.random.normal(jax.random.PRNGKey(32), (B, 2))

    qps_fleet = jax.jit(
        lambda xs_, uds_: asif_to_qp_fleet(
            X, U, prm, 1.1, xs_, uds_, W_u, ulim, f, h, bu
        )
    )(xs, uds)
    qps_vmap = jax.jit(
        jax.vmap(
            lambda x, ud: asif_to_qp(X, U, prm, 1.1, x, ud, W_u, ulim, f, h, bu)
        )
    )(xs, uds)
    for a, b, name in zip(qps_fleet, qps_vmap, ("P", "q", "A", "l", "u")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-11, err_msg=name
        )
