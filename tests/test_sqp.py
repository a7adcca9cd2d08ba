"""Native SQP solver tests: analytic problems with known optima, and a scipy
oracle cross-check (the role of the reference's Ipopt validation,
tests/test_ocp_ipopt.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.ocp.nlp import NLP, NLPSolutionStatus
from smooth_feedback_tpu.qp import QPSolverParams
from smooth_feedback_tpu.solvers import SQPParams, solve_nlp_sqp

inf = float("inf")


def test_equality_constrained_qp():
    """min x'x s.t. x0 + x1 = 1 -> x = (0.5, 0.5)."""
    nlp = NLP(
        n=2,
        m=1,
        f=lambda x: x @ x,
        g=lambda x: jnp.array([x[0] + x[1]]),
        xl=jnp.full(2, -inf),
        xu=jnp.full(2, inf),
        gl=jnp.array([1.0]),
        gu=jnp.array([1.0]),
    )
    sol = solve_nlp_sqp(nlp, jnp.zeros(2))
    assert int(sol.status) == NLPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.x, [0.5, 0.5], atol=1e-7)
    np.testing.assert_allclose(sol.lam, [-1.0], atol=1e-6)


def test_rosenbrock_box():
    """Rosenbrock with box constraint; optimum at (1, 1)."""
    nlp = NLP(
        n=2,
        m=1,
        f=lambda x: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2,
        g=lambda x: jnp.array([x[0] + x[1]]),
        xl=jnp.array([-2.0, -2.0]),
        xu=jnp.array([2.0, 2.0]),
        gl=jnp.array([-10.0]),
        gu=jnp.array([10.0]),
    )
    sol = solve_nlp_sqp(nlp, jnp.array([-1.0, 1.0]), SQPParams(max_iter=200))
    assert int(sol.status) == NLPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.x, [1.0, 1.0], atol=1e-6)


def test_inequality_active():
    """min (x0-2)^2 + (x1-1)^2 s.t. x0 + x1 <= 2, x >= 0 -> (1.5, 0.5)."""
    nlp = NLP(
        n=2,
        m=1,
        f=lambda x: (x[0] - 2) ** 2 + (x[1] - 1) ** 2,
        g=lambda x: jnp.array([x[0] + x[1]]),
        xl=jnp.zeros(2),
        xu=jnp.full(2, inf),
        gl=jnp.array([-inf]),
        gu=jnp.array([2.0]),
    )
    sol = solve_nlp_sqp(nlp, jnp.zeros(2))
    assert int(sol.status) == NLPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.x, [1.5, 0.5], atol=1e-6)


def test_nonlinear_constraint():
    """min x0 + x1 s.t. x0^2 + x1^2 = 1 -> (-1/sqrt2, -1/sqrt2)."""
    nlp = NLP(
        n=2,
        m=1,
        f=lambda x: x[0] + x[1],
        g=lambda x: jnp.array([x @ x]),
        xl=jnp.full(2, -inf),
        xu=jnp.full(2, inf),
        gl=jnp.array([1.0]),
        gu=jnp.array([1.0]),
    )
    sol = solve_nlp_sqp(nlp, jnp.array([0.5, -0.8]), SQPParams(max_iter=100))
    assert int(sol.status) == NLPSolutionStatus.Optimal
    np.testing.assert_allclose(sol.x, [-(2**-0.5)] * 2, atol=1e-6)


def test_scipy_oracle_agreement():
    """Random smooth NLPs agree with scipy trust-constr."""
    from smooth_feedback_tpu.compat import solve_nlp_scipy

    rng = np.random.default_rng(5)
    for trial in range(3):
        Q = rng.standard_normal((4, 4))
        Q = Q @ Q.T + np.eye(4)
        c = rng.standard_normal(4)
        A = rng.standard_normal((2, 4))
        b = rng.standard_normal(2)

        nlp = NLP(
            n=4,
            m=2,
            f=lambda x: 0.5 * x @ jnp.asarray(Q) @ x + jnp.asarray(c) @ x
            + 0.1 * jnp.sum(jnp.sin(x)),
            g=lambda x: jnp.asarray(A) @ x + 0.05 * jnp.sin(x[:2]) - jnp.asarray(b),
            xl=jnp.full(4, -5.0),
            xu=jnp.full(4, 5.0),
            gl=jnp.array([-inf, 0.0]),
            gu=jnp.array([0.5, 0.0]),
        )
        sol = solve_nlp_sqp(nlp, jnp.zeros(4), SQPParams(max_iter=100))
        ref = solve_nlp_scipy(nlp, np.zeros(4))
        assert int(sol.status) == NLPSolutionStatus.Optimal
        np.testing.assert_allclose(sol.x, ref.x, atol=1e-5)


def test_vmap_batch_of_nlps():
    """Fleets of NLPs solve in lockstep under vmap."""
    def make(b):
        return NLP(
            n=2,
            m=1,
            f=lambda x: (x[0] - b) ** 2 + x[1] ** 2,
            g=lambda x: jnp.array([x[0] + x[1]]),
            xl=jnp.full(2, -inf),
            xu=jnp.full(2, inf),
            gl=jnp.array([-inf]),
            gu=jnp.array([1.0]),
        )

    # parametrize the NLP by data captured through closure over vmapped input
    def solve_one(b):
        nlp = make(b)
        return solve_nlp_sqp(nlp, jnp.zeros(2), SQPParams(max_iter=30))

    bs = jnp.array([0.0, 1.0, 3.0])
    sols = jax.jit(jax.vmap(solve_one))(bs)
    np.testing.assert_allclose(sols.x[0], [0.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(sols.x[1], [1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(sols.x[2], [2.0, -1.0], atol=1e-6)  # constrained


def test_f32_rosenbrock_chain():
    """f32 exact-Hessian SQP (the TPU configuration): unconverged ADMM
    subproblem iterates are usable line-search directions, so f32 converges
    in the same ~4 iterations as f64 instead of stalling at reg escalation."""
    n = 12
    f = lambda x: jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)
    g = lambda x: jnp.array([jnp.sum(x) - 0.9 * n])
    nlp = NLP(n=n, m=1, f=f, g=g,
              xl=-5 * jnp.ones(n, jnp.float32), xu=5 * jnp.ones(n, jnp.float32),
              gl=jnp.zeros(1, jnp.float32), gu=jnp.zeros(1, jnp.float32))
    prm = SQPParams(max_iter=100, tol=1e-3, qp=QPSolverParams(
        eps_abs=1e-5, eps_rel=1e-5, polish=False, max_iter=2000, kkt_refine_iters=1))
    sol = jax.jit(lambda x: solve_nlp_sqp(nlp, x, prm))(0.9 * jnp.ones(n, jnp.float32))
    assert int(sol.status) == int(NLPSolutionStatus.Optimal)
    assert int(sol.iters) <= 10
