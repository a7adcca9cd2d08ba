"""Lie group core tests.

Validates group axioms, exp/log round trips, and — following the reference's
derivative self-check pattern (ocp.hpp:165-338) — that every closed-form
Jacobian/adjoint override agrees with the generic autodiff fallback derived
from exp/log/compose alone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.groups import SE2, SE3, SO2, SO3, Bundle, LieGroup, Rn
from smooth_feedback_tpu.groups.base import jacobian_wrt_group

GROUPS = {
    "R3": Rn(3),
    "SO2": SO2,
    "SO3": SO3,
    "SE2": SE2,
    "SE3": SE3,
    "Bundle(SE2,R2)": Bundle(SE2, Rn(2)),
    "Bundle(SO3,R3,SO2)": Bundle(SO3, Rn(3), SO2),
}


def _keys(name, n=3):
    import zlib

    seed = zlib.crc32(name.encode())
    return jax.random.split(jax.random.PRNGKey(seed), n)


@pytest.mark.parametrize("name", GROUPS)
def test_group_axioms(name):
    G = GROUPS[name]
    k1, k2, k3 = _keys(name)
    a, b, c = G.random(k1), G.random(k2), G.random(k3)
    e = G.identity()

    # identity / inverse
    np.testing.assert_allclose(G.compose(a, e), a, atol=1e-12)
    np.testing.assert_allclose(G.compose(e, a), a, atol=1e-12)
    np.testing.assert_allclose(G.compose(a, G.inverse(a)), e, atol=1e-12)
    # associativity
    np.testing.assert_allclose(
        G.compose(G.compose(a, b), c), G.compose(a, G.compose(b, c)), atol=1e-11
    )


@pytest.mark.parametrize("name", GROUPS)
def test_exp_log_roundtrip(name):
    G = GROUPS[name]
    (k1,) = _keys(name, 1)
    v = 0.7 * jax.random.normal(k1, (G.ndof,))
    np.testing.assert_allclose(G.log(G.exp(v)), v, atol=1e-10)

    g = G.random(k1)
    np.testing.assert_allclose(G.exp(G.log(g)), g, atol=1e-10)

    # small / zero tangents (Taylor branches)
    z = jnp.zeros(G.ndof)
    np.testing.assert_allclose(G.exp(z), G.identity(), atol=1e-14)
    tiny = 1e-9 * jnp.ones(G.ndof)
    np.testing.assert_allclose(G.log(G.exp(tiny)), tiny, atol=1e-14)


@pytest.mark.parametrize("name", GROUPS)
def test_rplus_rminus(name):
    G = GROUPS[name]
    k1, k2, _ = _keys(name)
    a, b = G.random(k1), G.random(k2)
    v = 0.3 * jax.random.normal(k2, (G.ndof,))

    np.testing.assert_allclose(G.rminus(G.rplus(a, v), a), v, atol=1e-10)
    np.testing.assert_allclose(G.rplus(b, G.rminus(a, b)), a, atol=1e-10)


class _Fallback(LieGroup):
    """Wraps a group but exposes ONLY the autodiff fallbacks of base.LieGroup."""

    def __init__(self, g):
        self.inner = g
        self.nparams = g.nparams
        self.ndof = g.ndof

    def _key(self):
        return ("fallback", self.inner._key())

    def identity(self, dtype=None):
        return self.inner.identity(dtype)

    def exp(self, v):
        return self.inner.exp(v)

    def log(self, g):
        return self.inner.log(g)

    def compose(self, a, b):
        return self.inner.compose(a, b)

    def inverse(self, g):
        return self.inner.inverse(g)


@pytest.mark.parametrize("name", GROUPS)
def test_closed_forms_vs_autodiff(name):
    """Closed-form Ad/ad/dr_exp/dr_expinv match autodiff-derived versions."""
    G = GROUPS[name]
    F = _Fallback(G)
    k1, k2, _ = _keys(name)
    g = G.random(k1)
    v = 0.6 * jax.random.normal(k2, (G.ndof,))

    np.testing.assert_allclose(G.Ad(g), F.Ad(g), atol=1e-8)
    np.testing.assert_allclose(G.ad(v), F.ad(v), atol=1e-8)
    np.testing.assert_allclose(G.dr_exp(v), F.dr_exp(v), atol=1e-8)
    np.testing.assert_allclose(G.dr_expinv(v), F.dr_expinv(v), atol=1e-8)


@pytest.mark.parametrize("name", GROUPS)
def test_jacobian_identities(name):
    G = GROUPS[name]
    k1, k2, _ = _keys(name)
    v = 0.6 * jax.random.normal(k1, (G.ndof,))
    g = G.random(k2)

    # dr_exp * dr_expinv = I
    np.testing.assert_allclose(G.dr_exp(v) @ G.dr_expinv(v), jnp.eye(G.ndof), atol=1e-9)
    # Ad(exp(v)) = expm(ad(v))
    np.testing.assert_allclose(
        G.Ad(G.exp(v)), jax.scipy.linalg.expm(G.ad(v)), atol=1e-8
    )
    # Ad(g^{-1}) = Ad(g)^{-1}
    np.testing.assert_allclose(
        G.Ad(G.inverse(g)) @ G.Ad(g), jnp.eye(G.ndof), atol=1e-9
    )
    # dl_exp(v) = Ad(exp(v)) dr_exp(v) and dr_exp(-v) = dl_exp(v)
    np.testing.assert_allclose(G.dl_exp(v), G.dr_exp(-v), atol=1e-8)


@pytest.mark.parametrize("name", GROUPS)
def test_vmap_jit(name):
    """All core ops are vmappable and jittable with batch axes."""
    G = GROUPS[name]
    keys = jax.random.split(jax.random.PRNGKey(0), 16)
    gs = jax.vmap(G.random)(keys)
    vs = 0.3 * jax.random.normal(keys[0], (16, G.ndof))

    out = jax.jit(jax.vmap(G.rplus))(gs, vs)
    assert out.shape == (16, G.nparams)
    back = jax.jit(jax.vmap(G.rminus))(out, gs)
    np.testing.assert_allclose(back, vs, atol=1e-9)

    ads = jax.jit(jax.vmap(G.Ad))(gs)
    assert ads.shape == (16, G.ndof, G.ndof)


def test_jacobian_wrt_group():
    """jacobian_wrt_group reproduces the analytic right Jacobian of rminus."""
    G = SE2
    k1, k2, _ = _keys("wrt")
    x, y = G.random(k1), G.random(k2)

    # d/dx (x ominus y) = dr_expinv(x ominus y)  [reference mpc.hpp:293-301]
    val, J = jacobian_wrt_group(G, lambda g: G.rminus(g, y), x)
    np.testing.assert_allclose(J, G.dr_expinv(val), atol=1e-9)


def test_so3_log_principal():
    """SO(3) log handles quaternion double cover (q and -q same rotation)."""
    v = jnp.array([0.3, -0.2, 0.5])
    q = SO3.exp(v)
    np.testing.assert_allclose(SO3.log(-q), v, atol=1e-12)


@pytest.mark.parametrize("name", GROUPS)
def test_second_order_vs_autodiff(name):
    """Closed-form d2r_exp/d2r_expinv (SO3/SE2 hand-derived; SE3 autodiff of
    the closed dr forms) match autodiff of the exp/log fallbacks, within the
    injectivity radius where dr_expinv is single-valued."""
    G = GROUPS[name]
    F = _Fallback(G)
    k1, _, _ = _keys(name)
    for i, scale in enumerate((1e-6, 0.009, 0.4, 0.9)):
        v = scale * jax.random.normal(jax.random.fold_in(k1, i), (G.ndof,))
        np.testing.assert_allclose(G.d2r_exp(v), F.d2r_exp(v), atol=1e-9)
        np.testing.assert_allclose(G.d2r_expinv(v), F.d2r_expinv(v), atol=1e-9)


def test_series_derivative_helpers():
    """d/ds coefficient helpers match autodiff of the (total, smooth) base
    coefficient functions away from their cancellation zones, and the series
    branch is smooth across the seam."""
    from smooth_feedback_tpu.groups import _series as se

    # skip s in [1e-4, 1e-1): there the base functions' exact branch itself
    # cancels under f64 autodiff (verified the helpers against longdouble
    # references to ~1e-12 across that zone)
    ss = jnp.concatenate([jnp.logspace(-10, -4.2, 20), jnp.logspace(-1, 1.2, 40)])
    for f, base in [
        (se.dcos1c2, se.cos1c2),
        (se.dsin3c2, se.sin3c2),
        (se.djlinv2c2, se.jlinv2c2),
    ]:
        got = jax.vmap(f)(ss)
        want = jax.vmap(jax.grad(base))(ss)
        np.testing.assert_allclose(got, want, rtol=2e-7, atol=1e-12)


@pytest.mark.parametrize("name", GROUPS)
def test_reverse_mode_finite_at_zero(name):
    """REVERSE-mode derivatives of the Jacobian closed forms are finite at
    (and near) e = 0.  Regression for the where-guard NaN leak: exact
    branches that divided by the raw squared angle (instead of the guarded
    one) made jacrev of the flattened SE(3) dynamics NaN at e = 0 — which
    is every flatten/SQP solve's linearization point (fe in ocp/flatten.py;
    _series.py cos4c2 note)."""
    G = GROUPS[name]
    n = G.ndof
    ones = jnp.ones((n,))
    for pt in (jnp.zeros(n), 1e-9 * jnp.ones(n), 0.3 * jnp.arange(1.0, n + 1) / n):
        for op in (G.dr_exp, G.dr_expinv, G.dl_expinv):
            Jr = jax.jacrev(lambda e: op(e) @ ones)(pt)
            Jf = jax.jacfwd(lambda e: op(e) @ ones)(pt)
            assert bool(jnp.isfinite(Jr).all()), (name, op.__name__, pt)
            np.testing.assert_allclose(
                np.asarray(Jr), np.asarray(Jf), atol=1e-12,
                err_msg=f"{name} {op.__name__} fwd/rev disagree",
            )
        # the rev-of-fwd Hessian path the SQP's exact mode traces
        H = jax.jacrev(jax.jacfwd(lambda e: G.dr_expinv(e)[0, :] @ ones))(pt)
        assert bool(jnp.isfinite(H).all()), (name, "d2 dr_expinv", pt)
