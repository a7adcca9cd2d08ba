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
            polish=0,  # matches prm above (polish parity has its own test)
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


def test_native_polish_parity():
    """Polish ON in both solvers: polished primals/duals agree to near
    machine precision (both drive the active-set KKT residual to ~0)."""
    prm = QPSolverParams(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, polish=True)
    keys = jax.random.split(jax.random.PRNGKey(31), 6)
    for k in keys:
        qp = random_qp(k, n=6, m=8)
        jsol = solve_qp(qp, prm)
        nres = solve_qp_native(
            *[np.asarray(a) for a in qp],
            eps_abs=1e-6, eps_rel=1e-6, max_iter=20000, polish=1,
        )
        assert int(jsol.status) == nres.status
        if nres.status == QPSolutionStatus.Optimal:
            np.testing.assert_allclose(jsol.primal, nres.primal, atol=1e-9)
            np.testing.assert_allclose(jsol.dual, nres.dual, atol=1e-9)


def test_native_polish_kkt():
    """The native polished solution satisfies stationarity and
    complementarity to machine precision (the JAX suite asserts the same for
    the XLA path, test_polish_accuracy)."""
    for seed in (5, 17):
        qp = random_qp(jax.random.PRNGKey(seed), n=8, m=10)
        P, q, A, l, u = [np.asarray(a, np.float64) for a in qp]
        res = solve_qp_native(P, q, A, l, u, eps_abs=1e-6, eps_rel=1e-6,
                              max_iter=20000, polish=1)
        assert res.status == QPSolutionStatus.Optimal
        x, y = res.primal, res.dual
        stat = np.abs(P @ x + q + A.T @ y).max()
        Ax = A @ x
        pfeas = np.maximum(l - Ax, Ax - u).max()
        comp = np.abs(np.where(y > 0, Ax - u, Ax - l) * y).max()
        assert stat <= 1e-11, stat
        assert pfeas <= 1e-11, pfeas
        assert comp <= 1e-11, comp


def test_native_adaptive_rho_parity():
    """adaptive_rho in the embedded solver mirrors the JAX implementation
    exactly: same statuses, same iteration counts (same adaptation schedule),
    matching primals — on scale-imbalanced problems where adaptation fires."""
    import dataclasses

    prm = QPSolverParams(
        eps_abs=1e-7, eps_rel=1e-7, max_iter=50000, polish=False,
        scaling=False, adaptive_rho=True,
    )
    keys = jax.random.split(jax.random.PRNGKey(31), 6)
    adapted = 0
    for k in keys:
        qp0 = random_qp(k, n=5, m=9)
        qp = QuadraticProgram(
            P=1000.0 * qp0.P, q=1000.0 * qp0.q, A=qp0.A, l=qp0.l, u=qp0.u
        )
        jsol = solve_qp(qp, prm)
        nres = solve_qp_native(
            *[np.asarray(a) for a in qp],
            eps_abs=1e-7, eps_rel=1e-7, max_iter=50000, polish=0,
            scaling=0, adaptive_rho=1,
        )
        assert int(jsol.status) == nres.status
        assert int(jsol.iters) == nres.iters, (int(jsol.iters), nres.iters)
        if nres.status == QPSolutionStatus.Optimal:
            np.testing.assert_allclose(jsol.primal, nres.primal, atol=1e-5)
        # count problems where adaptation actually beat the static schedule
        jstat = solve_qp(qp, dataclasses.replace(prm, adaptive_rho=False))
        if int(jsol.iters) < int(jstat.iters):
            adapted += 1
    assert adapted >= 3  # the imbalanced family must actually exercise it


def test_native_rho_eq_scale():
    """rho_eq_scale flows through the C ABI (equality rows get scaled rho)."""
    # equality-constrained QP: min x'x s.t. x0 + x1 = 1
    P = np.eye(2)
    q = np.zeros(2)
    A = np.array([[1.0, 1.0]])
    l = np.array([1.0])
    u = np.array([1.0])
    r1 = solve_qp_native(P, q, A, l, u, rho_eq_scale=1e3, polish=0)
    r2 = solve_qp_native(P, q, A, l, u, rho_eq_scale=15.0, polish=0)
    assert r1.status == r2.status == QPSolutionStatus.Optimal
    np.testing.assert_allclose(r1.primal, [0.5, 0.5], atol=1e-3)
    np.testing.assert_allclose(r2.primal, [0.5, 0.5], atol=1e-3)
    # different rho schedules -> (generically) different iteration counts
    js = solve_qp(
        QuadraticProgram(*map(jnp.asarray, (P, q, A, l, u))),
        QPSolverParams(polish=False, rho_eq_scale=15.0),
    )
    assert int(js.iters) == r2.iters


def test_native_sanitizers():
    """Build the embedded solver with ASan+UBSan and drive every code path
    (scaled solve, polish, warmstart, adaptive rho, infeasible) — the
    reference links -fsanitize=undefined,address into every test binary
    (tests/CMakeLists.txt:27); this is the analog for the native twin."""
    import os
    import subprocess
    import tempfile
    import textwrap

    here = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )  # repo root
    src = os.path.join(here, "smooth_feedback_tpu", "native", "qp_solver.cpp")

    driver = textwrap.dedent("""
        #include <cstdio>
        extern "C" {
        struct SfQpOptions {
          double alpha, rho, sigma; int scaling;
          double eps_abs, eps_rel, eps_primal_inf, eps_dual_inf;
          int max_iter, stop_check_iter, polish, polish_iter;
          double delta, rho_eq_scale; int adaptive_rho; double adaptive_rho_tol;
        };
        struct SfQpResult { int status; int iters; double objective, primal_res, dual_res; };
        void sf_qp_default_options(SfQpOptions*);
        int sf_qp_solve(int, int, const double*, const double*, const double*,
                        const double*, const double*, const SfQpOptions*,
                        double*, double*, SfQpResult*);
        }
        int main() {
          const double inf = 1.0 / 0.0;
          SfQpOptions o; sf_qp_default_options(&o);
          SfQpResult r;
          // box QP with polish
          { double P[4] = {1,0,0,1}, q[2] = {-4, 0.25};
            double A[4] = {1,0,0,1}, l[2] = {-1,-1}, u[2] = {1,1};
            double x[2] = {0,0}, y[2] = {0,0};
            if (sf_qp_solve(2, 2, P, q, A, l, u, &o, x, y, &r) != 0) return 1;
            // warmstarted re-solve
            if (sf_qp_solve(2, 2, P, q, A, l, u, &o, x, y, &r) != 0) return 2; }
          // adaptive rho on a scale-imbalanced problem, no scaling
          { SfQpOptions oa = o; oa.scaling = 0; oa.adaptive_rho = 1; oa.polish = 0;
            double P[4] = {1000,0,0,1000}, q[2] = {-4000, 250};
            double A[4] = {1,0,0,1}, l[2] = {-1,-1}, u[2] = {1,1};
            double x[2] = {0,0}, y[2] = {0,0};
            if (sf_qp_solve(2, 2, P, q, A, l, u, &oa, x, y, &r) != 0) return 3; }
          // primal infeasible (certificate path) + unbounded rho pinning
          { double P[4] = {1,0,0,1}, q[2] = {0.1, 0.1};
            double A[6] = {1,1, -1,-1, 1,0}, l[3] = {0.5, 0.5, -inf}, u[3] = {1, 1, inf};
            double x[2] = {0,0}, y[3] = {0,0,0};
            if (sf_qp_solve(2, 3, P, q, A, l, u, &o, x, y, &r) != 2) return 4; }
          // equality rows + rho_eq_scale
          { SfQpOptions oe = o; oe.rho_eq_scale = 15.0; oe.polish = 0;
            double P[4] = {1,0,0,1}, q[2] = {0, 0};
            double A[2] = {1,1}, l[1] = {1}, u[1] = {1};
            double x[2] = {0,0}, y[1] = {0};
            if (sf_qp_solve(2, 1, P, q, A, l, u, &oe, x, y, &r) != 0) return 5; }
          std::puts("SAN OK");
          return 0;
        }
    """)

    with tempfile.TemporaryDirectory() as td:
        main_cpp = os.path.join(td, "main.cpp")
        exe = os.path.join(td, "san_driver")
        with open(main_cpp, "w") as f:
            f.write(driver)
        build = subprocess.run(
            ["g++", "-std=c++17", "-O1", "-g",
             "-fsanitize=address,undefined", "-fno-sanitize-recover=all",
             src, main_cpp, "-o", exe],
            capture_output=True, text=True,
        )
        assert build.returncode == 0, build.stderr
        run = subprocess.run([exe], capture_output=True, text=True)
        assert run.returncode == 0, (run.returncode, run.stdout, run.stderr)
        assert "SAN OK" in run.stdout
