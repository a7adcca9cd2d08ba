"""Batched ADMM QP solver tests.

Mirrors the reference's test strategy (tests/test_qp.cpp): closed-form
oracles, the portfolio problem with a known answer, infeasibility
certificates, warmstarting, plus batched execution and a scipy cross-check
(standing in for the OSQP oracle, which isn't available in this image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.qp import (
    QPSolutionStatus,
    QPSolverParams,
    QuadraticProgram,
    random_qp,
    solve_qp,
    solve_qp_batch,
)

inf = np.inf
TOL = 1e-4
PRM = QPSolverParams()


def _qp(P, q, A, l, u):
    f = lambda a: jnp.asarray(a, dtype=jnp.float64)
    return QuadraticProgram(P=f(P), q=f(q), A=f(A), l=f(l), u=f(u))


def test_basic():
    """Box-constrained diagonal QP (reference test_qp.cpp:54-73)."""
    qp = _qp(np.eye(2), [-4, 0.25], np.eye(2), [-1, -1], [1, 1])
    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.primal, [1, -0.25], atol=TOL)
    np.testing.assert_allclose(sol.objective, 0.5 - 4 - 1 / 32, atol=TOL)

    # warmstarted solve reaches the same solution
    sol_ws = solve_qp(qp, PRM, warmstart=sol)
    assert int(sol_ws.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol_ws.primal, [1, -0.25], atol=TOL)


def test_unconstrained():
    """(reference test_qp.cpp:149-166)"""
    P = [[4, 2, 2], [2, 4, 2], [2, 2, 4]]
    qp = _qp(P, [-8, -6, -10], np.zeros((1, 3)), [-inf], [inf])
    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.primal, [1, 0, 2], atol=TOL)


def test_half_constrained():
    """(reference test_qp.cpp:168-185)"""
    P = [[4, 2, 2], [2, 4, 2], [2, 2, 4]]
    qp = _qp(P, [-8, -6, -10], np.eye(3), [-inf, -inf, -10], [inf, 10, inf])
    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.primal, [1, 0, 2], atol=TOL)


def test_primal_infeasible_easy():
    """Trivially empty box (reference test_qp.cpp:187-199)."""
    qp = _qp(np.eye(2), [0.1, 0.1], np.eye(2), [-1, 1], [1, -1])
    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.PrimalInfeasible


def test_primal_infeasible_hard():
    """Conflicting halfspaces need the certificate (test_qp.cpp:201-213)."""
    qp = _qp(np.eye(2), [0.1, 0.1], [[1, 1], [-1, -1]], [0.5, 0.5], [1, 1])
    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.PrimalInfeasible


def test_primal_infeasible_infinity():
    """(reference test_qp.cpp:215-227)"""
    qp = _qp(
        np.eye(2),
        [0.1, 0.1],
        [[1, 1], [-1, -1], [1, 0], [0, 1]],
        [0.5, 0.5, -inf, -inf],
        [1, 1, inf, inf],
    )
    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.PrimalInfeasible


def test_dual_infeasible():
    """Unbounded below (reference test_qp.cpp:229-242)."""
    P = np.zeros((2, 2))
    P[0, 0] = 1
    qp = _qp(P, [1, -1], np.eye(2), [-1, -inf], [1, inf])
    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.DualInfeasible


def test_portfolio():
    """Portfolio QP with known optimum (reference test_qp.cpp:244-272)."""
    P = [
        [0.018641, 0.00359853, 0.00130976],
        [0.00359853, 0.00643694, 0.00488727],
        [0.00130976, 0.00488727, 0.0686828],
    ]
    A = [
        [1, 1, 1],
        [0.0260022, 0.00810132, 0.0737159],
        [1, 0, 0],
        [0, 1, 0],
        [0, 0, 1],
    ]
    qp = _qp(P, np.zeros(3), A, [-inf, 50, 0, 0, 0], [1000, inf, inf, inf, inf])
    answer = np.array([497.04552984986384, 0.0, 502.9544801594811])

    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.primal, answer, atol=TOL * np.linalg.norm(answer))
    np.testing.assert_allclose(sol.objective, 22634.417849884154 / 2, atol=5e-2)

    sol_ws = solve_qp(qp, PRM, warmstart=sol)
    assert int(sol_ws.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol_ws.primal, answer, atol=TOL * np.linalg.norm(answer))


def test_two_dimensional():
    """(reference test_qp.cpp:314-336)"""
    qp = _qp(
        [[0.0100131, 0], [0, 0.01]],
        [-0.329554, 0.536459],
        [[-0.0639209, -0.168], [-0.467, 0]],
        [-inf, -inf],
        [-0.034974, 0.46571],
    )
    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.primal, [46.6338, -17.5351], atol=1e-3)


def test_batch_matches_single():
    """Batched solve returns identical results to one-at-a-time solves
    (the analog of the reference's dense/sparse cross-validation)."""
    keys = jax.random.split(jax.random.PRNGKey(42), 8)
    qps = jax.vmap(lambda k: random_qp(k, n=6, m=8))(keys)

    batch_sol = solve_qp_batch(qps, PRM)
    for i in range(8):
        qp_i = jax.tree.map(lambda a: a[i], qps)
        sol_i = solve_qp(qp_i, PRM)
        assert int(sol_i.status) == int(batch_sol.status[i])
        np.testing.assert_allclose(sol_i.primal, batch_sol.primal[i], atol=1e-10)
        np.testing.assert_allclose(sol_i.dual, batch_sol.dual[i], atol=1e-10)


def test_batch_mixed_statuses():
    """A batch mixing optimal / primal-infeasible / dual-infeasible problems
    resolves each element's status independently."""
    q1 = _qp(np.eye(2), [-4, 0.25], np.eye(2), [-1, -1], [1, 1])  # optimal
    q2 = _qp(np.eye(2), [0.1, 0.1], np.eye(2), [-1, 1], [1, -1])  # prim inf
    P = np.zeros((2, 2))
    P[0, 0] = 1
    q3 = _qp(P, [1, -1], np.eye(2), [-1, -inf], [1, inf])  # dual inf

    batch = jax.tree.map(lambda *xs: jnp.stack(xs), q1, q2, q3)
    sol = solve_qp_batch(batch, PRM)
    assert list(np.asarray(sol.status)) == [
        QPSolutionStatus.Optimal,
        QPSolutionStatus.PrimalInfeasible,
        QPSolutionStatus.DualInfeasible,
    ]
    np.testing.assert_allclose(sol.primal[0], [1, -0.25], atol=TOL)


def test_scipy_crosscheck():
    """Random QPs agree with a scipy reference solution at matching accuracy
    (plays the role of the reference's OSQP oracle, compat/osqp.hpp)."""
    from scipy.optimize import minimize

    prm = QPSolverParams(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    for k in keys:
        qp = random_qp(k, n=5, m=5)
        sol = solve_qp(qp, prm)
        assert int(sol.status) == QPSolutionStatus.Optimal

        P, q, A, l, u = map(np.asarray, qp)
        res = minimize(
            lambda x: 0.5 * x @ P @ x + q @ x,
            np.zeros(5),
            jac=lambda x: P @ x + q,
            constraints=[
                {"type": "ineq", "fun": lambda x: A @ x - l, "jac": lambda x: A},
                {"type": "ineq", "fun": lambda x: u - A @ x, "jac": lambda x: -A},
            ],
            method="SLSQP",
            options={"maxiter": 500, "ftol": 1e-12},
        )
        assert res.success
        np.testing.assert_allclose(sol.primal, res.x, atol=1e-4)


def test_polish_improves_accuracy():
    """With polish the KKT residuals drop to ~machine precision on an
    active-constrained problem (role of reference polish, qp_solver.hpp:93)."""
    qp = _qp(np.eye(2), [-4, 0.25], np.eye(2), [-1, -1], [1, 1])
    sol = solve_qp(qp, QPSolverParams(polish=True))
    # exact solution x = (1, -0.25); active constraint x0 <= 1
    np.testing.assert_allclose(sol.primal, [1, -0.25], atol=1e-9)


def test_no_scaling_no_polish():
    qp = _qp(np.eye(2), [-4, 0.25], np.eye(2), [-1, -1], [1, 1])
    sol = solve_qp(qp, QPSolverParams(scaling=False, polish=False))
    assert int(sol.status) == QPSolutionStatus.Optimal
    # without polish the iterate is only ~eps_abs accurate
    np.testing.assert_allclose(sol.primal, [1, -0.25], atol=2e-3)


def test_equality_constraints():
    """Rows with l == u get the stiff-rho equality treatment."""
    P = np.eye(3)
    q = [1.0, 1.0, 1.0]
    A = [[1, 1, 1]]
    qp = _qp(P, q, A, [1.5], [1.5])
    sol = solve_qp(qp, PRM)
    assert int(sol.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.primal, [0.5, 0.5, 0.5], atol=TOL)
    np.testing.assert_allclose(np.sum(sol.primal), 1.5, atol=1e-6)


def test_iters_reported():
    qp = _qp(np.eye(2), [-4, 0.25], np.eye(2), [-1, -1], [1, 1])
    sol = solve_qp(qp, PRM)
    assert int(sol.iters) > 0
    assert float(sol.primal_res) < PRM.eps_abs + 1e-12


def test_pallas_backend_parity():
    """The fused Pallas kernel (interpret mode on CPU) reproduces the XLA
    iteration path exactly: statuses, iteration counts, and primals."""
    keys = jax.random.split(jax.random.PRNGKey(33), 6)
    qps = jax.vmap(lambda k: random_qp(k, n=7, m=9, dtype=jnp.float32))(keys)
    prm_x = QPSolverParams(max_iter=2000)
    prm_p = QPSolverParams(max_iter=2000, backend="pallas")
    rx = solve_qp_batch(qps, prm_x)
    rp = solve_qp_batch(qps, prm_p)
    assert np.array_equal(np.asarray(rx.status), np.asarray(rp.status))
    assert np.array_equal(np.asarray(rx.iters), np.asarray(rp.iters))
    np.testing.assert_allclose(rx.primal, rp.primal, atol=1e-5)


def test_pallas_shared_backend_parity():
    """The shared-matrix Pallas kernel (the flagship reuse_factors +
    fleet_shared_t path in bench.py) reproduces the XLA shared-factors path:
    statuses, iteration counts, and primals (interpret mode on CPU)."""
    from smooth_feedback_tpu.qp import qp_factorize

    n, m, B = 7, 9, 5
    qp1 = random_qp(jax.random.PRNGKey(7), n=n, m=m, dtype=jnp.float32)
    shift = 0.05 * jax.random.normal(jax.random.PRNGKey(8), (B, m), jnp.float32)
    qps = QuadraticProgram(
        P=qp1.P[None],
        q=jnp.broadcast_to(qp1.q[None], (B, n)),
        A=qp1.A[None],
        l=qp1.l[None] + shift,
        u=qp1.u[None] + shift,
    )
    prm_x = QPSolverParams(max_iter=2000, polish=False)
    prm_p = QPSolverParams(max_iter=2000, polish=False, backend="pallas")
    fac_b = qp_factorize(jax.tree.map(lambda a: a[None], qp1), prm_x)
    fac1 = jax.tree.map(lambda a: a[0], fac_b)  # batch-free => shared path

    rx = solve_qp_batch(qps, prm_x, None, fac1)
    rp = solve_qp_batch(qps, prm_p, None, fac1)
    assert np.all(np.asarray(rx.status) == QPSolutionStatus.Optimal)
    assert np.array_equal(np.asarray(rx.status), np.asarray(rp.status))
    assert np.array_equal(np.asarray(rx.iters), np.asarray(rp.iters))
    np.testing.assert_allclose(rx.primal, rp.primal, atol=1e-5)


def test_pallas_shared_backend_parity_npad384():
    """Shared-kernel parity at padded size 384 — the K=100 MPC horizon class
    that used to fall off the fused path (pre-raised-VMEM the gate rejected
    anything over padded 256 and dropped 15x to the XLA shared-GEMM
    fallback).  Interpret mode on CPU; on device the same call raises the
    Mosaic scoped-VMEM limit."""
    from smooth_feedback_tpu.qp import qp_factorize
    from smooth_feedback_tpu.qp.pallas_kernel import shared_kernel_fits

    n, m, B = 302, 310, 4  # pads to 384x384 (the K=100 DI MPC shape class)
    assert shared_kernel_fits(n, m)

    key = jax.random.PRNGKey(9)
    M = jax.random.normal(key, (n, n), jnp.float32) / np.sqrt(n)
    P = M @ M.T + jnp.eye(n, dtype=jnp.float32)
    A = jax.random.normal(jax.random.PRNGKey(10), (m, n), jnp.float32) / np.sqrt(n)
    centers = jnp.einsum(
        "mn,bn->bm", A, jax.random.normal(jax.random.PRNGKey(12), (B, n), jnp.float32)
    )
    qps = QuadraticProgram(
        P=P[None],
        q=jax.random.normal(jax.random.PRNGKey(11), (B, n), jnp.float32),
        A=A[None],
        l=centers - 1.0,
        u=centers + 1.0,
    )
    qp1 = jax.tree.map(lambda a: a[0], qps)
    prm_x = QPSolverParams(max_iter=2000, polish=False)
    prm_p = QPSolverParams(max_iter=2000, polish=False, backend="pallas")
    fac_b = qp_factorize(jax.tree.map(lambda a: a[None], qp1), prm_x)
    fac1 = jax.tree.map(lambda a: a[0], fac_b)

    rx = solve_qp_batch(qps, prm_x, None, fac1)
    rp = solve_qp_batch(qps, prm_p, None, fac1)
    assert np.all(np.asarray(rx.status) == QPSolutionStatus.Optimal)
    assert np.array_equal(np.asarray(rx.status), np.asarray(rp.status))
    assert np.array_equal(np.asarray(rx.iters), np.asarray(rp.iters))
    np.testing.assert_allclose(rx.primal, rp.primal, atol=1e-5)


def _kkt_residuals(qps, sol):
    """Stationarity, primal feasibility, complementary slackness (unscaled).

    Infinite bounds are handled the KKT way: a one-sided row contributes no
    slackness product on its open side, but any multiplier pushing toward the
    open side is itself a violation (its magnitude is reported via comp)."""
    P, q, A, l, u = (np.asarray(a) for a in qps)
    x, y = np.asarray(sol.primal), np.asarray(sol.dual)
    Ax = np.einsum("bmn,bn->bm", A, x)
    stat = np.abs(
        np.einsum("bnk,bk->bn", P, x) + q + np.einsum("bmn,bm->bn", A, y)
    ).max(axis=1)
    lf, uf = np.isfinite(l), np.isfinite(u)
    l0, u0 = np.where(lf, l, 0.0), np.where(uf, u, 0.0)
    pfeas = np.maximum(
        np.where(lf, l0 - Ax, -np.inf), np.where(uf, Ax - u0, -np.inf)
    ).clip(min=0).max(axis=1)
    comp = (
        np.where(uf, np.maximum(y, 0) * (u0 - Ax), np.maximum(y, 0))
        + np.where(lf, np.maximum(-y, 0) * (Ax - l0), np.maximum(-y, 0))
    ).max(axis=1)
    return stat, pfeas, comp, Ax


def test_kkt_conditions_eps6():
    """Oracle-free 1e-6 verification: for random f64 QPs solved at eps=1e-6,
    the KKT conditions hold directly — no reference to any solver twin.
    Checks the OSQP termination criterion with its own scaling (Stellato et
    al. §3.4): residuals <= eps_abs + eps_rel * (problem scale)."""
    eps = 1e-6
    prm = QPSolverParams(eps_abs=eps, eps_rel=eps, max_iter=20000, polish=False)
    keys = jax.random.split(jax.random.PRNGKey(11), 16)
    qps = jax.vmap(lambda k: random_qp(k, n=8, m=10))(keys)
    sol = solve_qp_batch(qps, prm)
    assert np.all(np.asarray(sol.status) == QPSolutionStatus.Optimal)

    stat, pfeas, comp, Ax = _kkt_residuals(qps, sol)
    P, q, A, l, u = (np.asarray(a) for a in qps)
    x, y = np.asarray(sol.primal), np.asarray(sol.dual)
    dscale = np.maximum(
        np.abs(np.einsum("bnk,bk->bn", P, x)).max(axis=1),
        np.maximum(
            np.abs(q).max(axis=1), np.abs(np.einsum("bmn,bm->bn", A, y)).max(axis=1)
        ),
    )
    pscale = np.abs(Ax).max(axis=1)
    assert np.all(stat <= eps + eps * dscale)
    assert np.all(pfeas <= eps + eps * pscale)
    # complementarity follows from the ADMM fixed point: y is (up to the
    # primal residual) the projection residual, so each term is O(pres*|y|)
    assert np.all(comp <= (eps + eps * pscale) * (1 + np.abs(y).max(axis=1)))


def _assert_kkt(qps, sol, eps):
    """OSQP-style scaled KKT assertions shared by the 1e-6 suites."""
    stat, pfeas, comp, Ax = _kkt_residuals(qps, sol)
    P, q, A, l, u = (np.asarray(a) for a in qps)
    x, y = np.asarray(sol.primal), np.asarray(sol.dual)
    dscale = np.maximum(
        np.abs(np.einsum("bnk,bk->bn", P, x)).max(axis=1),
        np.maximum(
            np.abs(q).max(axis=1), np.abs(np.einsum("bmn,bm->bn", A, y)).max(axis=1)
        ),
    )
    pscale = np.abs(Ax).max(axis=1)
    assert np.all(stat <= eps + eps * dscale)
    assert np.all(pfeas <= eps + eps * pscale)
    assert np.all(comp <= (eps + eps * pscale) * (1 + np.abs(y).max(axis=1)))


def test_kkt_mpc_transcribed_eps6():
    """1e-6 KKT verification on the ACTUAL K=50 double-integrator MPC
    transcription (the headline-bench problem shape, block-banded equality
    structure + input bounds), not just random QPs — closes the hole left by
    the absent osqp oracle (VERDICT r2 missing #3).  f64, polish on."""
    from smooth_feedback_tpu.controllers import MPCParams, MPCWeights, make_mpc_step
    from smooth_feedback_tpu.groups import Rn

    eps = 1e-6
    X, U = Rn(2), Rn(1)
    f = lambda x, u: jnp.stack([x[1], u[0]])
    xdes = lambda t: jnp.stack([-0.5 * jnp.sin(0.3 * t), -0.15 * jnp.cos(0.3 * t)])
    udes = lambda t: jnp.zeros(1, jnp.float64)
    step, _ = make_mpc_step(
        X, U, f, xdes, udes,
        weights=MPCWeights(
            Q=jnp.eye(2, dtype=jnp.float64),
            Qtf=0.1 * jnp.eye(2, dtype=jnp.float64),
            R=0.1 * jnp.eye(1, dtype=jnp.float64),
        ),
        params=MPCParams(K=50, tf=5.0),
        cr=lambda x, u: u,
        crl=jnp.array([-0.5], jnp.float64),
        cru=jnp.array([0.5], jnp.float64),
        dtype=jnp.float64,
    )
    xs = 0.5 * jax.random.normal(jax.random.PRNGKey(5), (4, 2), jnp.float64)
    ts = jnp.asarray([0.0, 0.7, 1.9, 3.2], jnp.float64)
    qps = jax.vmap(step.transcribe)(ts, xs)

    prm = QPSolverParams(eps_abs=eps, eps_rel=eps, max_iter=40000, polish=True)
    sol = solve_qp_batch(qps, prm)
    assert np.all(np.asarray(sol.status) == QPSolutionStatus.Optimal)
    _assert_kkt(qps, sol, eps)


def test_kkt_asif_transcribed_eps6():
    """1e-6 KKT verification on the ACTUAL SE(2) vehicle ASIF QP (backup-
    trajectory barrier rows + input bounds + relaxation, the BASELINE
    config-4 shape).  f64, polish on."""
    from smooth_feedback_tpu.controllers.asif import ASIFtoQPParams, asif_to_qp
    from smooth_feedback_tpu.groups import SE2, Bundle, Rn
    from smooth_feedback_tpu.utils.bounds import ManifoldBounds

    eps = 1e-6
    X, U = Bundle(SE2, Rn(3)), Rn(2)

    def f(x, u):
        v = x[4:]
        return jnp.stack(
            [v[0], v[1], v[2], -0.2 * v[0] + u[0], jnp.zeros(()), -0.4 * v[2] + u[1]]
        )

    h = lambda t, x: jnp.array([jnp.linalg.norm(x[:2] - jnp.array([0.0, -2.3])) - 0.7])
    bu = lambda t, x: jnp.stack([0.2 * x[4], -jnp.asarray(0.5)])
    ulim = ManifoldBounds(
        A=jnp.eye(2, dtype=jnp.float64), c=jnp.zeros(2, jnp.float64),
        l=jnp.array([-0.2, -0.5], jnp.float64), u=jnp.array([0.5, 0.5], jnp.float64),
    )
    prm_asif = ASIFtoQPParams(K=50, dt=0.05, alpha=1.0, relax_cost=100.0)

    keys = jax.random.split(jax.random.PRNGKey(6), 4)
    x0s = jax.vmap(
        lambda k: X.rplus(X.identity(jnp.float64),
                          0.3 * jax.random.normal(k, (6,), jnp.float64))
    )(keys)
    u_des = jnp.array([0.3, 0.2], jnp.float64)
    qps = jax.vmap(
        lambda x0: asif_to_qp(
            X, U, prm_asif, 2.5, x0, u_des, jnp.array([20.0, 1.0], jnp.float64),
            ulim, f, h, bu,
        )
    )(x0s)

    prm = QPSolverParams(eps_abs=eps, eps_rel=eps, max_iter=40000, polish=True)
    sol = solve_qp_batch(qps, prm)
    assert np.all(np.asarray(sol.status) == QPSolutionStatus.Optimal)
    _assert_kkt(qps, sol, eps)


def test_polish_accuracy():
    """Polishing drives the KKT residuals of Optimal solves to machine
    precision (reference polish role, qp_solver.hpp:93-204)."""
    prm = QPSolverParams(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, polish=True)
    keys = jax.random.split(jax.random.PRNGKey(11), 16)
    qps = jax.vmap(lambda k: random_qp(k, n=8, m=10))(keys)
    sol = solve_qp_batch(qps, prm)
    assert np.all(np.asarray(sol.status) == QPSolutionStatus.Optimal)
    stat, pfeas, comp, _ = _kkt_residuals(qps, sol)
    assert stat.max() <= 1e-12
    assert pfeas.max() <= 1e-12
    assert comp.max() <= 1e-12


def test_stop_check_every_iteration():
    """stop_check_iter=1 must check every iteration, not disable checks."""
    qp = _qp(np.eye(2), [-4, 0.25], np.eye(2), [-1, -1], [1, 1])
    sol = solve_qp(qp, QPSolverParams(stop_check_iter=1))
    assert int(sol.status) == QPSolutionStatus.Optimal
    # with per-iteration checks the solve stops as soon as tolerances hit,
    # never at the iteration cap
    assert int(sol.iters) < QPSolverParams().max_iter
    sol25 = solve_qp(qp, QPSolverParams(stop_check_iter=25))
    assert int(sol.iters) <= int(sol25.iters)


def test_factorize_reuse():
    """qp_factorize + reuse gives the same solutions as the one-shot path."""
    from smooth_feedback_tpu.qp import qp_factorize

    keys = jax.random.split(jax.random.PRNGKey(44), 4)
    qps = jax.vmap(lambda k: random_qp(k, n=6, m=8))(keys)
    prm = QPSolverParams()
    fac = qp_factorize(qps, prm)
    r1 = solve_qp_batch(qps, prm)
    r2 = solve_qp_batch(qps, prm, None, fac)
    np.testing.assert_allclose(r1.primal, r2.primal, atol=1e-12)
    assert np.array_equal(np.asarray(r1.iters), np.asarray(r2.iters))


def test_solve_qp_timed_optimal():
    """With a generous budget solve_qp_timed matches the plain solve."""
    from smooth_feedback_tpu.qp import solve_qp_timed

    qp = _qp(np.eye(2), [-4, 0.25], np.eye(2), [-1, -1], [1, 1])
    sol = solve_qp_timed(qp, PRM, max_time=60.0, chunk_iter=50)
    assert int(sol.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.primal, [1, -0.25], atol=TOL)


def test_solve_qp_timed_budget_exceeded():
    """An expired wall-clock budget labels unconverged elements MaxTime
    (role of reference max_time, qp_solver.hpp:46-47,529-533)."""
    from smooth_feedback_tpu.qp import solve_qp_timed

    # unattainable tolerance so no chunk ever converges
    prm = QPSolverParams(eps_abs=1e-30, eps_rel=1e-30, max_iter=10000,
                         polish=False)
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    qps = jax.vmap(lambda k: random_qp(k, n=6, m=8))(keys)
    sol = solve_qp_timed(qps, prm, max_time=0.0, chunk_iter=50)
    assert np.all(np.asarray(sol.status) == QPSolutionStatus.MaxTime)
    assert np.all(np.asarray(sol.iters) == 50)  # exactly one chunk ran


def test_solve_qp_timed_iters_accumulate():
    """iters accumulates across chunks and the chunked path still converges."""
    from smooth_feedback_tpu.qp import solve_qp_timed

    qp = _qp(np.eye(2), [-4, 0.25], np.eye(2), [-1, -1], [1, 1])
    ref = solve_qp(qp, PRM)
    sol = solve_qp_timed(qp, PRM, max_time=60.0, chunk_iter=10)
    assert int(sol.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.primal, ref.primal, atol=TOL)
    assert int(sol.iters) >= int(ref.iters) // 2  # sane accumulation


def test_solve_qp_timed_no_double_count():
    """Elements that converge in an early chunk must not accumulate the
    re-solve iterations of later chunks (they re-enter as warmstarts because
    shapes are static, but that work is not theirs).  Element 0 converges in
    chunk 1; element 1 needs several chunks; element 0's reported iters must
    equal the unchunked solve's (cf. qp_solver.hpp:529-533)."""
    from smooth_feedback_tpu.qp import solve_qp_timed

    # tight tolerance without scaling spreads iteration counts ~100..2200
    # across random QPs (measured); chunk at 200 (a multiple of
    # stop_check_iter so chunked check cadence matches unchunked)
    prm = QPSolverParams(scaling=False, polish=False, max_iter=5000,
                         stop_check_iter=5, eps_abs=1e-7, eps_rel=1e-7)
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    qps = jax.vmap(lambda k: random_qp(k, n=6, m=8))(keys)
    chunk = 200

    ref = solve_qp_batch(qps, prm)
    ref_iters = np.asarray(ref.iters)
    assert np.all(np.asarray(ref.status) == QPSolutionStatus.Optimal)
    early = ref_iters < chunk
    assert early.any() and (~early).any(), "test fixture lost its spread"

    sol = solve_qp_timed(qps, prm, max_time=60.0, chunk_iter=chunk)
    sol_iters = np.asarray(sol.iters)
    assert np.all(np.asarray(sol.status) == QPSolutionStatus.Optimal)
    # chunk-1 convergers: identical first chunk, nothing added by later
    # chunks (the old accounting added ~stop_check_iter per extra chunk)
    np.testing.assert_array_equal(sol_iters[early], ref_iters[early])
    # multi-chunk elements: genuine accumulation, same order of work (the
    # warmstart re-entry reconstructs z = Ax, so the path is not bitwise
    # identical across the chunk boundary)
    assert np.all(sol_iters[~early] > chunk)
    assert np.all(sol_iters[~early] <= 2 * ref_iters[~early])


def test_pallas_shared_vmem_gate_falls_back(monkeypatch):
    """Shared problems whose padded size exceeds even the RAISED per-kernel
    VMEM budget must route to the XLA shared-GEMM path and still solve.
    Since the raised limit (toward the 128MB physical VMEM) now admits every
    realistic horizon — K=50 and K=100 both fit — the fallback is forced
    here by shrinking the budget."""
    from smooth_feedback_tpu.qp import pallas_kernel, qp_factorize
    from smooth_feedback_tpu.qp.pallas_kernel import shared_kernel_fits

    assert shared_kernel_fits(152, 203)  # K=50 fits (default 16MB limit)
    assert shared_kernel_fits(302, 302)  # K=100 fits (raised limit)
    assert not shared_kernel_fits(2200, 2200)  # beyond physical VMEM

    # shrink the raised budget so the 384-padded problem below is rejected
    # and the solver takes the XLA shared-GEMM fallback
    monkeypatch.setattr(pallas_kernel, "_VMEM_RAISED", 4 * 2**20)
    assert not shared_kernel_fits(270, 40)

    # one shared 270-var template, batch of 4 differing only in q/l/u
    n, m = 270, 40
    key = jax.random.PRNGKey(9)
    M = jax.random.normal(key, (n, n)) / np.sqrt(n)
    P = M @ M.T + jnp.eye(n)
    A = jax.random.normal(jax.random.PRNGKey(10), (m, n)) / np.sqrt(n)
    qs = jax.random.normal(jax.random.PRNGKey(11), (4, n))
    centers = jnp.einsum("mn,bn->bm", A, jax.random.normal(jax.random.PRNGKey(12), (4, n)))
    qp_b = QuadraticProgram(
        P=jnp.broadcast_to(P[None], (4, n, n)),
        q=qs,
        A=jnp.broadcast_to(A[None], (4, m, n)),
        l=centers - 1.0,
        u=centers + 1.0,
    )
    prm_x = QPSolverParams(max_iter=2000, polish=False)
    prm_p = QPSolverParams(max_iter=2000, polish=False, backend="pallas")
    fac = qp_factorize(
        QuadraticProgram(P=P, q=qs[0], A=A, l=qp_b.l[0], u=qp_b.u[0])._replace(
            P=P[None], q=qs[:1], A=A[None], l=qp_b.l[:1], u=qp_b.u[:1]
        ),
        prm_x,
    )
    fac1 = jax.tree.map(lambda a: a[0], fac)  # shared (batch-free) factors
    sx = solve_qp_batch(qp_b, prm_x, None, fac1)
    sp = solve_qp_batch(qp_b, prm_p, None, fac1)  # gated -> same XLA path
    np.testing.assert_allclose(np.asarray(sp.primal), np.asarray(sx.primal), atol=1e-12)
    assert np.array_equal(np.asarray(sp.status), np.asarray(sx.status))
    assert np.all(np.asarray(sx.status) == QPSolutionStatus.Optimal)


def test_sort_stragglers_exact():
    """sort_stragglers permutes the batch into kernel blocks by predicted
    difficulty and inverse-permutes the results — per-member iterates are
    freeze-masked independently, so outputs must be IDENTICAL to the
    unsorted solve (interpret mode on CPU)."""
    import dataclasses

    from smooth_feedback_tpu.qp import qp_factorize

    # B > 2*pallas_block with a ragged tail: the permutation must move
    # members ACROSS kernel-block boundaries and interact with the padding
    # rows of the last block (B=20 over G=8 blocks -> 3 blocks, last ragged).
    n, m, B = 7, 9, 20
    qp1 = random_qp(jax.random.PRNGKey(7), n=n, m=m, dtype=jnp.float32)
    shift = 0.3 * jax.random.normal(jax.random.PRNGKey(8), (B, m), jnp.float32)
    qps = QuadraticProgram(
        P=qp1.P[None],
        q=jnp.broadcast_to(qp1.q[None], (B, n)),
        A=qp1.A[None],
        l=qp1.l[None] + shift,
        u=qp1.u[None] + shift,
    )
    prm = QPSolverParams(max_iter=2000, polish=False, backend="pallas",
                         pallas_block=8)
    prm_sorted = dataclasses.replace(prm, sort_stragglers=True)
    fac_b = qp_factorize(jax.tree.map(lambda a: a[None], qp1), prm)
    fac1 = jax.tree.map(lambda a: a[0], fac_b)

    base = solve_qp_batch(qps, prm, None, fac1)
    assert np.all(np.asarray(base.status) == QPSolutionStatus.Optimal)
    # warmstart with scrambled "previous iters" so the permutation is
    # nontrivial
    ws = base._replace(
        iters=jnp.asarray(np.random.default_rng(0).permutation(B) * 7, jnp.int32)
    )
    r_plain = solve_qp_batch(qps, prm, ws, fac1)
    r_sorted = solve_qp_batch(qps, prm_sorted, ws, fac1)
    for a, b in zip(r_plain, r_sorted):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# lane (batch-trailing) backend
# ---------------------------------------------------------------------------


def _lane_prm(**kw):
    import dataclasses

    base = QPSolverParams(**kw)
    return base, dataclasses.replace(base, backend="lane")


def test_lane_backend_matches_xla_random():
    """backend='lane' produces the same statuses/solutions as the XLA path
    on a batch of random tiny QPs (the ASIF shape: tall, few variables)."""
    B, n, m = 24, 3, 20
    keys = jax.random.split(jax.random.PRNGKey(4), B)
    qps = jax.vmap(lambda k: random_qp(k, n=n, m=m))(keys)
    prm_x, prm_l = _lane_prm(max_iter=4000, polish=False)

    sx = solve_qp_batch(qps, prm_x)
    sl = solve_qp_batch(qps, prm_l)
    assert np.all(np.asarray(sx.status) == QPSolutionStatus.Optimal)
    np.testing.assert_array_equal(np.asarray(sl.status), np.asarray(sx.status))
    np.testing.assert_allclose(
        np.asarray(sl.primal), np.asarray(sx.primal), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(sl.dual), np.asarray(sx.dual), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sl.objective), np.asarray(sx.objective), atol=1e-8
    )


def test_lane_backend_polish_and_warmstart():
    """Polish (shared batch-leading finalize) and warmstart scaling compose
    with the lane iteration path."""
    B, n, m = 12, 4, 16
    keys = jax.random.split(jax.random.PRNGKey(5), B)
    qps = jax.vmap(lambda k: random_qp(k, n=n, m=m))(keys)
    prm_x, prm_l = _lane_prm(max_iter=4000, polish=True, eps_abs=1e-6, eps_rel=1e-6)

    sx = solve_qp_batch(qps, prm_x)
    sl = solve_qp_batch(qps, prm_l)
    np.testing.assert_array_equal(np.asarray(sl.status), np.asarray(sx.status))
    np.testing.assert_allclose(
        np.asarray(sl.primal), np.asarray(sx.primal), atol=1e-8
    )
    # warmstart from the solution: must converge immediately on both paths
    sl2 = solve_qp_batch(qps, prm_l, sl)
    assert np.all(np.asarray(sl2.status) == QPSolutionStatus.Optimal)
    assert np.all(np.asarray(sl2.iters) <= np.asarray(sl.iters))
    np.testing.assert_allclose(
        np.asarray(sl2.primal), np.asarray(sl.primal), atol=1e-6
    )


def test_lane_backend_certificates():
    """Primal/dual infeasibility certificates fire on the lane path."""
    # primal infeasible: x <= -1 and x >= 1
    P = jnp.eye(1)[None]
    q = jnp.zeros((1, 1))
    A = jnp.array([[[1.0], [1.0]]])
    l = jnp.array([[-jnp.inf, 1.0]])
    u = jnp.array([[-1.0, jnp.inf]])
    _, prm_l = _lane_prm(max_iter=4000, polish=False)
    sol = solve_qp_batch(QuadraticProgram(P=P, q=q, A=A, l=l, u=u), prm_l)
    assert int(sol.status[0]) == QPSolutionStatus.PrimalInfeasible

    # dual infeasible (unbounded): min -x, x >= 0
    P = jnp.zeros((1, 1, 1))
    q = jnp.array([[-1.0]])
    A = jnp.array([[[1.0]]])
    l = jnp.array([[0.0]])
    u = jnp.array([[jnp.inf]])
    sol = solve_qp_batch(QuadraticProgram(P=P, q=q, A=A, l=l, u=u), prm_l)
    assert int(sol.status[0]) == QPSolutionStatus.DualInfeasible

    # trivially infeasible box
    P = jnp.eye(1)[None]
    q = jnp.zeros((1, 1))
    A = jnp.array([[[1.0]]])
    l = jnp.array([[2.0]])
    u = jnp.array([[1.0]])
    sol = solve_qp_batch(QuadraticProgram(P=P, q=q, A=A, l=l, u=u), prm_l)
    assert int(sol.status[0]) == QPSolutionStatus.PrimalInfeasible


def test_lane_backend_with_precomputed_factors():
    """Per-problem QPFactors (batch-leading) transpose into the lane path."""
    from smooth_feedback_tpu.qp import qp_factorize

    B, n, m = 8, 3, 12
    keys = jax.random.split(jax.random.PRNGKey(6), B)
    qps = jax.vmap(lambda k: random_qp(k, n=n, m=m))(keys)
    prm_x, prm_l = _lane_prm(max_iter=4000, polish=False)
    fac = qp_factorize(qps, prm_l)
    s_fac = solve_qp_batch(qps, prm_l, None, fac)
    s_ref = solve_qp_batch(qps, prm_x)
    np.testing.assert_array_equal(np.asarray(s_fac.status), np.asarray(s_ref.status))
    np.testing.assert_allclose(
        np.asarray(s_fac.primal), np.asarray(s_ref.primal), atol=1e-6
    )


@pytest.mark.parametrize("n,m", [(40, 10), (48, 60), (64, 64)])
def test_lane_backend_midsize_parity(n, m):
    """32 < n engages the lane backend's batch-leading MXU factorization
    (einsum + batched Cholesky instead of the unrolled chol_lane); statuses,
    iteration counts, and primals must match the xla backend exactly."""
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(8), B)
    qps = jax.vmap(lambda k: random_qp(k, n=n, m=m))(keys)
    prm_x, prm_l = _lane_prm(polish=True)
    sx = solve_qp_batch(qps, prm_x)
    sl = solve_qp_batch(qps, prm_l)
    np.testing.assert_array_equal(np.asarray(sx.status), np.asarray(sl.status))
    np.testing.assert_array_equal(np.asarray(sx.iters), np.asarray(sl.iters))
    np.testing.assert_allclose(
        np.asarray(sx.primal), np.asarray(sl.primal), atol=1e-10
    )


def test_lane_backend_f32_kkt():
    """f32 lane solves satisfy the KKT conditions at solver tolerance."""
    B, n, m = 16, 3, 24
    keys = jax.random.split(jax.random.PRNGKey(9), B)
    qps = jax.vmap(lambda k: random_qp(k, n=n, m=m, dtype=jnp.float32))(keys)
    _, prm_l = _lane_prm(max_iter=8000, polish=False, eps_abs=1e-5, eps_rel=1e-5)
    sol = solve_qp_batch(qps, prm_l)
    assert np.all(np.asarray(sol.status) == QPSolutionStatus.Optimal)
    stat, pfeas, comp, _ = _kkt_residuals(qps, sol)
    assert float(stat.max()) < 5e-4
    assert float(pfeas.max()) < 5e-4


@pytest.mark.parametrize("backend", ["xla", "lane"])
def test_compensated_check_lifts_f32_dual_floor(backend):
    """At n = 64 and a tight eps_abs, f32 ADMM floors: accumulation noise in
    the residual evaluation (~eps * sqrt(n) * |Px| ~ 1e-5) plus iterate-level
    stalling keep the measured dual residual above eps_abs, so the plain
    solve reports MaxIterations.  With compensated_check the solver (a)
    evaluates residuals with error-free transforms and (b) re-certifies the
    compensated-refinement polished point, upgrading iteration-capped members
    whose polished KKT point truly passes.  The reported residuals must match
    an f64 re-evaluation of the returned iterate."""
    import dataclasses

    B, n, m = 8, 64, 64
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    M = jax.random.normal(ks[0], (B, n, n), jnp.float32)
    P = jnp.einsum("bij,bkj->bik", M, M) / n + 0.1 * jnp.eye(n, dtype=jnp.float32)
    q = jax.random.normal(ks[1], (B, n), jnp.float32)
    A = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), (B, m, n))
    beq = (0.1 * jax.random.normal(ks[2], (B, m))).astype(jnp.float32)
    qp = QuadraticProgram(P=P, q=q, A=A, l=beq, u=beq)

    prm = QPSolverParams(
        max_iter=20000, polish=False, eps_abs=2e-6, eps_rel=0.0,
        backend=backend,
    )
    sol_plain = solve_qp_batch(qp, prm)
    sol_comp = solve_qp_batch(
        qp, dataclasses.replace(prm, compensated_check=True, polish=True)
    )

    # plain f32 check floors above eps_abs on at least some members;
    # compensated certifies every member
    assert np.all(np.asarray(sol_comp.status) == QPSolutionStatus.Optimal)
    assert np.any(np.asarray(sol_plain.status) == QPSolutionStatus.MaxIterations)

    # the compensated-reported dual residual is truthful: f64 re-evaluation
    # of the returned iterate agrees within a few f32 ulps of the data
    P64, q64, A64 = (np.asarray(v, np.float64) for v in (P, q, A))
    x64 = np.asarray(sol_comp.primal, np.float64)
    y64 = np.asarray(sol_comp.dual, np.float64)
    dres64 = np.abs(
        np.einsum("bij,bj->bi", P64, x64) + q64
        + np.einsum("bmn,bm->bn", A64, y64)
    ).max(axis=1)
    np.testing.assert_allclose(
        np.asarray(sol_comp.dual_res), dres64, atol=5e-7, rtol=1e-3
    )
    assert np.all(dres64 <= 2e-6)


def test_lane_adaptive_rho():
    """adaptive_rho (lane backend) reaches the same solutions, faster on
    residual-imbalanced problems, and leaves certificates intact."""
    import dataclasses

    B, n, m = 16, 3, 24
    keys = jax.random.split(jax.random.PRNGKey(11), B)
    # imbalance the problems: wildly different cost/constraint scales
    def make(k):
        qp1 = random_qp(k, n=n, m=m)
        return QuadraticProgram(
            P=1000.0 * qp1.P, q=1000.0 * qp1.q, A=qp1.A, l=qp1.l, u=qp1.u
        )

    qps = jax.vmap(make)(keys)
    prm = QPSolverParams(
        max_iter=50000, polish=False, backend="lane", scaling=False,
        eps_abs=1e-7, eps_rel=1e-7,
    )
    prm_ad = dataclasses.replace(prm, adaptive_rho=True)

    s0 = solve_qp_batch(qps, prm)
    s1 = solve_qp_batch(qps, prm_ad)
    assert np.all(np.asarray(s1.status) == QPSolutionStatus.Optimal)
    # same minimizer wherever the static-rho path also converged
    ok0 = np.asarray(s0.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(
        np.asarray(s1.primal)[ok0], np.asarray(s0.primal)[ok0], atol=1e-4
    )
    # adaptation must help on these scale-imbalanced problems
    assert int(np.asarray(s1.iters).max()) < int(np.asarray(s0.iters).max())

    # certificates still fire with adaptation enabled
    P = jnp.eye(1)[None]
    q = jnp.zeros((1, 1))
    A = jnp.array([[[1.0], [1.0]]])
    l = jnp.array([[-jnp.inf, 1.0]])
    u = jnp.array([[-1.0, jnp.inf]])
    sol = solve_qp_batch(QuadraticProgram(P=P, q=q, A=A, l=l, u=u), prm_ad)
    assert int(sol.status[0]) == QPSolutionStatus.PrimalInfeasible


def test_adaptive_rho_xla():
    """adaptive_rho on the XLA backend: same minimizers, fewer straggler
    iterations on residual-imbalanced problems, and the same adaptation
    schedule as the lane backend (parity)."""
    import dataclasses

    B, n, m = 16, 3, 24
    keys = jax.random.split(jax.random.PRNGKey(11), B)

    def make(k):
        qp1 = random_qp(k, n=n, m=m)
        return QuadraticProgram(
            P=1000.0 * qp1.P, q=1000.0 * qp1.q, A=qp1.A, l=qp1.l, u=qp1.u
        )

    qps = jax.vmap(make)(keys)
    prm = QPSolverParams(
        max_iter=50000, polish=False, scaling=False, eps_abs=1e-7, eps_rel=1e-7
    )
    prm_ad = dataclasses.replace(prm, adaptive_rho=True)
    prm_ad_lane = dataclasses.replace(prm_ad, backend="lane")

    s0 = solve_qp_batch(qps, prm)
    s1 = solve_qp_batch(qps, prm_ad)
    assert np.all(np.asarray(s1.status) == QPSolutionStatus.Optimal)
    ok0 = np.asarray(s0.status) == QPSolutionStatus.Optimal
    np.testing.assert_allclose(
        np.asarray(s1.primal)[ok0], np.asarray(s0.primal)[ok0], atol=1e-4
    )
    assert int(np.asarray(s1.iters).max()) < int(np.asarray(s0.iters).max())

    # lane backend runs the identical adaptation schedule (layout-only diff)
    sl = solve_qp_batch(qps, prm_ad_lane)
    np.testing.assert_array_equal(np.asarray(s1.status), np.asarray(sl.status))
    np.testing.assert_array_equal(np.asarray(s1.iters), np.asarray(sl.iters))
    np.testing.assert_allclose(
        np.asarray(s1.primal), np.asarray(sl.primal), atol=1e-5
    )

    # certificates still fire with adaptation enabled
    P = jnp.eye(1)[None]
    q = jnp.zeros((1, 1))
    A = jnp.array([[[1.0], [1.0]]])
    l = jnp.array([[-jnp.inf, 1.0]])
    u = jnp.array([[-1.0, jnp.inf]])
    sol = solve_qp_batch(QuadraticProgram(P=P, q=q, A=A, l=l, u=u), prm_ad)
    assert int(sol.status[0]) == QPSolutionStatus.PrimalInfeasible


def test_adaptive_rho_vmap_sqp_shape():
    """adaptive_rho composes with vmap over unbatched solves (the vmapped-SQP
    inner-QP configuration): lax.cond lowers to both-branch select."""
    import dataclasses

    B, n, m = 6, 4, 8
    keys = jax.random.split(jax.random.PRNGKey(13), B)
    qps = jax.vmap(lambda k: random_qp(k, n=n, m=m))(keys)
    prm_ad = dataclasses.replace(
        QPSolverParams(max_iter=20000, polish=False), adaptive_rho=True
    )

    from smooth_feedback_tpu.qp import solve_qp

    sv = jax.vmap(lambda qp1: solve_qp(qp1, prm_ad))(qps)
    sb = solve_qp_batch(qps, prm_ad)
    assert np.all(np.asarray(sv.status) == QPSolutionStatus.Optimal)
    np.testing.assert_allclose(
        np.asarray(sv.primal), np.asarray(sb.primal), atol=1e-5
    )


def test_adaptive_rho_rejected_pallas_and_shared():
    import dataclasses

    from smooth_feedback_tpu.qp import qp_factorize

    B, n, m = 2, 3, 5
    keys = jax.random.split(jax.random.PRNGKey(12), B)
    qps = jax.vmap(lambda k: random_qp(k, n=n, m=m))(keys)
    prm_p = dataclasses.replace(QPSolverParams(), adaptive_rho=True, backend="pallas")
    with pytest.raises(ValueError, match="adaptive_rho"):
        solve_qp_batch(qps, prm_p)

    # shared factors (no leading batch axis) share one rho: rejected
    prm_x = dataclasses.replace(QPSolverParams(), adaptive_rho=True)
    qp1 = jax.tree.map(lambda a: a[:1], qps)
    fac = jax.tree.map(lambda a: a[0], qp_factorize(qp1, prm_x))
    with pytest.raises(ValueError, match="adaptive_rho"):
        solve_qp_batch(qps, prm_x, None, fac)


def test_qp_phase_timings_breakdown():
    """qp_phase_timings reports the measured factor/iterate/polish
    wall-time split (the reference verbose table's TPU analog,
    qp_solver.hpp:550-565): phases are non-negative, sum to ~total, and
    the polish leg vanishes when polish is off."""
    from smooth_feedback_tpu.qp import qp_phase_timings, random_qp

    B = 8
    qps = jax.vmap(lambda k: random_qp(k, n=6, m=8))(
        jax.random.split(jax.random.PRNGKey(11), B)
    )
    t = qp_phase_timings(qps, QPSolverParams(polish=True), reps=2)
    assert t["batch"] == B and t["iters_mean"] > 0
    for k in ("factor_ms", "iterate_ms", "polish_ms", "total_ms"):
        assert t[k] >= 0.0
    assert t["total_ms"] >= t["factor_ms"]

    t2 = qp_phase_timings(qps, QPSolverParams(polish=False), reps=2)
    assert t2["polish_ms"] == 0.0

    # single (unbatched) QP works too
    one = jax.tree.map(lambda a: a[0], qps)
    t3 = qp_phase_timings(one, QPSolverParams(), reps=1)
    assert t3["batch"] == 1
