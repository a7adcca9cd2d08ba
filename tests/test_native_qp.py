"""Cross-language parity: the embedded C++ ADMM solver must agree with the
JAX kernel (statuses and solutions) on the reference test problems and random
QPs — the role the OSQP oracle plays in the reference (compat/osqp.hpp)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.native import native_available, solve_qp_native
from smooth_feedback_tpu.qp import (
    QPSolutionStatus,
    QPSolverParams,
    QuadraticProgram,
    random_qp,
    solve_qp,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="no C++ toolchain")

inf = np.inf


def test_native_basic():
    res = solve_qp_native(
        np.eye(2), [-4, 0.25], np.eye(2), [-1, -1], [1, 1]
    )
    assert res.status == QPSolutionStatus.Optimal
    np.testing.assert_allclose(res.primal, [1, -0.25], atol=2e-3)


def test_native_infeasible():
    res = solve_qp_native(
        np.eye(2), [0.1, 0.1], [[1, 1], [-1, -1]], [0.5, 0.5], [1, 1]
    )
    assert res.status == QPSolutionStatus.PrimalInfeasible


def test_native_vs_jax_random():
    """Same problems, same tolerances: statuses match, primals agree."""
    prm = QPSolverParams(
        eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, polish=False
    )
    keys = jax.random.split(jax.random.PRNGKey(11), 6)
    for k in keys:
        qp = random_qp(k, n=6, m=8)
        jsol = solve_qp(qp, prm)
        nres = solve_qp_native(
            *[np.asarray(a) for a in qp],
            eps_abs=1e-6,
            eps_rel=1e-6,
            max_iter=20000,
        )
        assert int(jsol.status) == nres.status
        if nres.status == QPSolutionStatus.Optimal:
            np.testing.assert_allclose(jsol.primal, nres.primal, atol=1e-4)
            np.testing.assert_allclose(
                float(jsol.objective), nres.objective, rtol=1e-5, atol=1e-7
            )


def test_native_iteration_parity():
    """Identical algorithm: iteration counts match the JAX solver exactly."""
    prm = QPSolverParams(polish=False)
    keys = jax.random.split(jax.random.PRNGKey(21), 4)
    for k in keys:
        qp = random_qp(k, n=5, m=5)
        jsol = solve_qp(qp, prm)
        nres = solve_qp_native(*[np.asarray(a) for a in qp])
        assert int(jsol.iters) == nres.iters, (int(jsol.iters), nres.iters)


def test_native_warmstart():
    qp = random_qp(jax.random.PRNGKey(3), n=6, m=8)
    args = [np.asarray(a) for a in qp]
    cold = solve_qp_native(*args)
    warm = solve_qp_native(*args, warmstart=(cold.primal, cold.dual))
    assert warm.status == QPSolutionStatus.Optimal
    assert warm.iters <= cold.iters
