"""Collocation mesh tests (mirroring reference tests/test_collocation_mesh.cpp
and test_collocation_dyn_error.cpp):

- LGR node/weight quadrature exactness
- differentiation / integration matrix consistency on polynomials
- refinement splitting and degree logic, node monotonicity
- mesh function evaluation / integration / defects
- dynamics error ~ 0 for exactly represented polynomial trajectories
- interpolation round trips
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.ocp.collocation import (
    Mesh,
    diffmat_local,
    intmat_local,
    lgr_nodes,
    lgr_plus_one,
    mesh_dyn,
    mesh_dyn_error,
    mesh_eval,
    mesh_integrate,
    mesh_interp,
)


@pytest.mark.parametrize("K", range(1, 12))
def test_lgr_quadrature_exactness(K):
    """K-point LGR quadrature on [0,1] is exact to degree 2K-2."""
    n, w = lgr_nodes(K)
    assert n[0] == 0.0
    assert np.all(np.diff(n) > 0)
    assert n[-1] < 1.0
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-13)
    for d in range(2 * K - 1):
        np.testing.assert_allclose(
            np.sum(w * n**d), 1.0 / (d + 1), atol=1e-12, err_msg=f"degree {d}"
        )


@pytest.mark.parametrize("K", range(2, 11))
def test_diffmat_exact_on_polynomials(K):
    """D differentiates degree-K polynomials exactly at collocation points."""
    t, _ = lgr_plus_one(K)
    D = diffmat_local(K)  # (K+1, K)
    rng = np.random.default_rng(K)
    coefs = rng.standard_normal(K + 1)
    vals = np.polyval(coefs, t)
    dvals_true = np.polyval(np.polyder(coefs), t[:K])
    dvals = vals @ D
    np.testing.assert_allclose(dvals, dvals_true, rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("K", range(2, 11))
def test_intmat_inverts_diffmat(K):
    I = intmat_local(K)
    D = diffmat_local(K)
    np.testing.assert_allclose(I @ D[1:, :], np.eye(K), atol=1e-9)


def test_refine_ph():
    """Splitting and degree-raising logic (cf. mesh.hpp:145-167 and
    test_collocation_mesh.cpp:38-77)."""
    m = Mesh(Kmin=5, Kmax=10)
    assert m.N_ivals == 1 and m.N_colloc == 5

    # raise degree
    m2 = m.refine_ph(0, 8)
    assert m2.N_ivals == 1 and m2.N_colloc == 8

    # lower target does nothing
    m3 = m2.refine_ph(0, 3)
    assert m3 == m2

    # split: D > Kmax
    m4 = m.refine_ph(0, 12)
    assert m4.N_ivals == 3  # ceil(12/5) = 3
    assert all(K == 5 for K, _ in m4.intervals)
    taus = [t for _, t in m4.intervals]
    np.testing.assert_allclose(taus, [0, 1 / 3, 2 / 3], atol=1e-12)

    # nodes monotone over a refined mesh
    nodes = m4.all_nodes()
    assert np.all(np.diff(nodes) > 0)
    assert nodes[0] == 0.0 and nodes[-1] == 1.0


def test_refine_errors():
    m = Mesh.uniform(2, 5)
    errs = [1e-8, 1e-2]
    m2 = m.refine_errors(errs, 1e-6)
    # first interval untouched, second refined
    assert m2.intervals[0] == (5, 0.0)
    assert m2.N_colloc > m.N_colloc


def test_increase_decrease_degrees():
    m = Mesh.uniform(3, 5, Kmin=5, Kmax=10)
    m2 = m.increase_degrees()
    assert all(K == 6 for K, _ in m2.intervals)
    m3 = m2.decrease_degrees()
    assert m3 == m


def test_mesh_integrate_exact():
    """Quadrature of a smooth function over a multi-degree mesh."""
    m = Mesh.uniform(3, 5).refine_ph(1, 8)
    N = m.N_colloc
    taus = m.all_nodes()
    t0, tf = 0.0, 2.0
    X = jnp.zeros((N + 1, 1))
    U = jnp.zeros((N, 1))
    val = mesh_integrate(m, lambda t, x, u: jnp.sin(t)[None], t0, tf, X, U)
    np.testing.assert_allclose(val, 1.0 - np.cos(2.0), atol=1e-9)


def test_mesh_dyn_zero_for_exact_solution():
    """Defects vanish when X solves dx/dt = f exactly and f is polynomial."""
    m = Mesh.uniform(2, 6)
    t0, tf = 0.0, 1.5
    taus = m.all_nodes()
    ts = t0 + (tf - t0) * taus
    # dynamics dx/dt = [2t, 1]; exact x(t) = [t^2, t]
    X = jnp.stack([ts**2, ts], axis=1)
    U = jnp.zeros((m.N_colloc, 1))
    f = lambda t, x, u: jnp.stack([2 * t, jnp.ones_like(t)])
    d = mesh_dyn(m, f, t0, tf, X, U)
    np.testing.assert_allclose(d, 0.0, atol=1e-9)


def test_mesh_dyn_error_polynomial():
    """Dynamics error ~ 0 for exactly-represented polynomials and > 0
    otherwise (cf. test_collocation_dyn_error.cpp:31-79)."""
    m = Mesh.uniform(2, 6)
    t0, tf = 0.0, 1.0

    xfun = lambda t: jnp.stack([t**3, t])
    ufun = lambda t: jnp.zeros((1,))
    f_exact = lambda t, x, u: jnp.stack([3 * t**2, jnp.ones_like(t)])
    errs = mesh_dyn_error(m, f_exact, t0, tf, xfun, ufun)
    np.testing.assert_allclose(errs, 0.0, atol=1e-9)

    f_wrong = lambda t, x, u: jnp.stack([3 * t**2 + 1.0, jnp.ones_like(t)])
    errs2 = mesh_dyn_error(m, f_wrong, t0, tf, xfun, ufun)
    assert np.all(np.asarray(errs2) > 1e-3)


def test_mesh_interp_roundtrip():
    """Interpolation reproduces polynomial values between nodes."""
    m = Mesh.uniform(2, 5).refine_ph(0, 7)
    taus = m.all_nodes()
    vals = jnp.stack([taus**3, np.cos(taus)], axis=1)

    for tq in [0.0, 0.17, 0.5, 0.77, 1.0]:
        out = mesh_interp(m, vals, jnp.asarray(tq))
        np.testing.assert_allclose(out[0], tq**3, atol=1e-6)

    # derivative of the cubic component
    out1 = mesh_interp(m, vals, jnp.asarray(0.3), deriv=1)
    np.testing.assert_allclose(out1[0], 3 * 0.3**2, atol=1e-6)


def test_mesh_interp_higher_derivatives():
    """deriv >= 2 (reference Mesh::eval arbitrary order, mesh.hpp:433-471)."""
    m = Mesh.uniform(2, 6).refine_ph(1, 8)
    taus = m.all_nodes()
    vals = jnp.stack([taus**4, taus**2], axis=1)

    for tq in [0.13, 0.5, 0.81, float(taus[2])]:
        d2 = mesh_interp(m, vals, jnp.asarray(tq), deriv=2)
        np.testing.assert_allclose(d2[0], 12 * tq**2, atol=1e-5)
        np.testing.assert_allclose(d2[1], 2.0, atol=1e-6)
        d3 = mesh_interp(m, vals, jnp.asarray(tq), deriv=3)
        np.testing.assert_allclose(d3[0], 24 * tq, atol=1e-4)
        np.testing.assert_allclose(d3[1], 0.0, atol=1e-6)
    # order beyond the polynomial degree -> 0
    d9 = mesh_interp(m, vals, jnp.asarray(0.4), deriv=9)
    np.testing.assert_allclose(np.asarray(d9), 0.0, atol=1e-3)

    # no-extend path (u trajectories): second derivative of a cubic
    vals_u = jnp.asarray(taus[:-1] ** 3)[:, None]
    d2u = mesh_interp(m, vals_u, jnp.asarray(0.9), extend=False, deriv=2)
    np.testing.assert_allclose(d2u[0], 6 * 0.9, atol=1e-5)


def test_mesh_interp_grad_at_nodes():
    """d/dtau of the interpolant is correct AT mesh nodes (the old
    second-form short-circuit returned zero tangents there)."""
    m = Mesh.uniform(2, 5).refine_ph(0, 7)
    taus = m.all_nodes()
    vals = jnp.stack([taus**3, 2 * taus], axis=1)

    g = jax.grad(lambda t: mesh_interp(m, vals, t)[0])
    # interior mesh nodes (skip endpoints: one-sided polynomial pieces)
    for tq in [taus[1], taus[3], 0.31, taus[-2]]:
        np.testing.assert_allclose(float(g(jnp.asarray(float(tq)))),
                                   3 * float(tq) ** 2, atol=1e-6)


def test_mesh_interp_no_extend():
    """extend=False uses only collocation values (u-trajectory interp)."""
    m = Mesh.uniform(2, 5)
    taus = m.all_nodes()[:-1]
    vals = jnp.asarray(taus**2)[:, None]
    out = mesh_interp(m, vals, jnp.asarray(0.9), extend=False)
    np.testing.assert_allclose(out[0], 0.81, atol=1e-8)


def test_mesh_interp_jit_vmap():
    m = Mesh.uniform(3, 5)
    taus = m.all_nodes()
    vals = jnp.asarray(np.sin(3 * taus))[:, None]
    f = jax.jit(jax.vmap(lambda t: mesh_interp(m, vals, t)))
    tq = jnp.linspace(0, 1, 33)
    out = f(tq)
    np.testing.assert_allclose(out[:, 0], np.sin(3 * np.asarray(tq)), atol=2e-4)
