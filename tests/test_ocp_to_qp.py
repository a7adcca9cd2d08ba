"""ocp_to_qp transcription tests (mirroring reference tests/test_ocp_to_qp.cpp):
feasibility of exact trajectories, QP solution quality on the double
integrator, and the Lie-group (non-commutative) path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.groups import SE2, Rn
from smooth_feedback_tpu.ocp import OCP, ocp_to_qp, qpsol_to_ocpsol, variable_layout
from smooth_feedback_tpu.ocp.collocation import Mesh
from smooth_feedback_tpu.qp import QPSolutionStatus, QPSolverParams, solve_qp


def _di_ocp(dtype=jnp.float64):
    """Double integrator: x = (p, v), u = acc; tracks origin."""
    X, U = Rn(2), Rn(1)
    Q = jnp.eye(2, dtype=dtype)
    R = 0.1 * jnp.eye(1, dtype=dtype)
    Qtf = 0.1 * jnp.eye(2, dtype=dtype)

    return OCP(
        X=X,
        U=U,
        theta=lambda tf, x0, xf, q: q[0] + 0.5 * xf @ Qtf @ xf,
        f=lambda t, x, u: jnp.stack([x[1], u[0]]),
        g=lambda t, x, u: jnp.array([0.5 * x @ Q @ x + 0.5 * u @ R @ u]),
        cr=lambda t, x, u: u,
        crl=jnp.array([-0.5], dtype),
        cru=jnp.array([0.5], dtype),
        ce=lambda tf, x0, xf, q: x0,
        cel=jnp.array([1.0, 0.0], dtype),
        ceu=jnp.array([1.0, 0.0], dtype),
    )


def test_layout():
    ocp = _di_ocp()
    mesh = Mesh.uniform(2, 4, Kmin=4, Kmax=4)
    lay = variable_layout(ocp, mesh)
    N = mesh.N_colloc
    assert N == 8
    assert lay["Nvar"] == 2 * (N + 1) + 1 * N
    assert lay["Ncon"] == 2 * N + 1 * N + 2


def test_exact_trajectory_feasible():
    """Plugging an exact dynamics trajectory into the transcription gives zero
    dynamics defects (reference test_ocp_to_qp.cpp:84-106 pattern).

    Linearize around xl(t) = (t^2, 2t), ul(t) = 2 (an exact solution of the
    double integrator): the dyn equality rows must have l = u = 0 and the
    zero perturbation must satisfy them."""
    ocp = _di_ocp()
    mesh = Mesh.uniform(2, 5, Kmin=5, Kmax=5)
    tf = 1.5

    xl = lambda t: jnp.stack([t**2, 2 * t])
    ul = lambda t: jnp.array([2.0])

    qp = ocp_to_qp(ocp, mesh, tf, xl, ul)
    lay = variable_layout(ocp, mesh)
    ld = np.asarray(qp.l[: lay["dcon_L"]])
    ud = np.asarray(qp.u[: lay["dcon_L"]])
    np.testing.assert_allclose(ld, 0.0, atol=1e-9)
    np.testing.assert_allclose(ud, 0.0, atol=1e-9)

    # the dyn rows evaluated at a consistent perturbation stay feasible:
    # perturb by a second exact solution delta x(t) = (a t + b, a), du = 0
    taus = mesh.all_nodes()
    dx = np.stack([0.3 * taus * tf + 0.1, 0.3 * np.ones_like(taus)], axis=1)
    du = np.zeros((mesh.N_colloc, 1))
    z = np.concatenate([dx.ravel(), du.ravel()])
    resid = np.asarray(qp.A) @ z
    np.testing.assert_allclose(resid[: lay["dcon_L"]], 0.0, atol=1e-9)


def test_transcribed_qp_solves():
    """The transcribed DI QP solves to optimality and the solution satisfies
    initial conditions and input bounds."""
    ocp = _di_ocp()
    mesh = Mesh.uniform(5, 4, Kmin=4, Kmax=4)
    tf = 5.0
    xl = lambda t: jnp.zeros(2)
    ul = lambda t: jnp.zeros(1)

    qp = ocp_to_qp(ocp, mesh, tf, xl, ul)
    sol = solve_qp(qp, QPSolverParams(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000))
    assert int(sol.status) == QPSolutionStatus.Optimal

    lay = variable_layout(ocp, mesh)
    N = lay["N"]
    xsol = np.asarray(sol.primal[: lay["xvar_L"]]).reshape(N + 1, 2)
    usol = np.asarray(sol.primal[lay["uvar_B"] :]).reshape(N, 1)

    # initial condition x(0) = (1, 0)
    np.testing.assert_allclose(xsol[0], [1.0, 0.0], atol=1e-4)
    # input bounds
    assert np.all(usol <= 0.5 + 1e-5) and np.all(usol >= -0.5 - 1e-5)
    # regulates toward origin
    assert np.linalg.norm(xsol[-1]) < 0.2

    # interpolated solution matches node values
    osol = qpsol_to_ocpsol(ocp, mesh, sol, tf, xl, ul)
    x_at_0 = osol.x(jnp.asarray(0.0))
    np.testing.assert_allclose(x_at_0, xsol[0], atol=1e-8)


def test_jit_and_vmap_transcription():
    """Transcription is traceable: jit once, vmap over initial conditions."""
    ocp = _di_ocp()
    mesh = Mesh.uniform(2, 4, Kmin=4, Kmax=4)

    def build(x0):
        o = ocp._replace(
            ce=lambda tf, a0, af, q: a0 - x0,
            cel=jnp.zeros(2),
            ceu=jnp.zeros(2),
        )
        return ocp_to_qp(o, mesh, 2.0, lambda t: jnp.zeros(2), lambda t: jnp.zeros(1))

    x0s = jnp.stack([jnp.array([1.0, 0.0]), jnp.array([0.0, 1.0]), jnp.array([-1.0, 0.5])])
    qps = jax.jit(jax.vmap(build))(x0s)
    assert qps.P.shape[0] == 3
    lay = variable_layout(ocp, mesh)
    # ce rows: l = cel - ce(xl) = 0 - (0 - x0) = x0
    ce_l = np.asarray(qps.l[:, lay["cecon_B"] :])
    np.testing.assert_allclose(ce_l, np.asarray(x0s), atol=1e-12)


def test_se2_ad_correction_present():
    """On a non-commutative group the ad-correction term modifies the state
    Jacobian blocks (ocp_to_qp.hpp:262-264)."""
    X, U = SE2, Rn(2)

    def f(t, x, u):
        # unicycle with constant forward drift
        return jnp.array([u[0] + 1.0, 0.0, u[1]])

    ocp = OCP(
        X=X,
        U=U,
        theta=lambda tf, x0, xf, q: q[0],
        f=f,
        g=lambda t, x, u: jnp.array([0.5 * (u @ u)]),
        cr=lambda t, x, u: jnp.zeros((0,)),
        crl=jnp.zeros((0,)),
        cru=jnp.zeros((0,)),
        ce=lambda tf, x0, xf, q: X.rminus(x0, X.identity()),
        cel=jnp.zeros(3),
        ceu=jnp.zeros(3),
    )
    mesh = Mesh.uniform(2, 4, Kmin=4, Kmax=4)
    xl = lambda t: SE2.identity()
    ul = lambda t: jnp.zeros(2)

    qp = ocp_to_qp(ocp, mesh, 1.0, xl, ul)
    lay = variable_layout(ocp, mesh)
    # first dyn block row, state block 0: tf * (df/dx - 0.5 ad(f + dxl))
    blk = np.asarray(qp.A[:3, :3])
    # df/dx = 0 here; f + dxl = (1,0,0); ad_se2((1,0,0)) has entry [1,2] = -v_x...
    ad = np.asarray(SE2.ad(jnp.array([1.0, 0.0, 0.0])))
    D0 = mesh.interval_diffmat_unscaled(0)[1]
    alpha = mesh.interval_diffmat_unscaled(0)[0]
    expected = -0.5 * 1.0 * ad - alpha * D0[0, 0] * np.eye(3)
    np.testing.assert_allclose(blk, expected, atol=1e-9)
