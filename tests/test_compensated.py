"""Compensated (two-float) accumulation vs f64 ground truth.

The on-device KKT certificate (SQPParams.compensated_kkt) rests on these
transforms being error-free in f32; each test computes the same quantity in
f64 and checks the compensated f32 result lands ~eps^2-close — and that the
PLAIN f32 computation does not (i.e. the compensation is actually doing
something on these inputs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.utils.compensated import (
    cdot,
    cmatvec_t,
    csum,
    stationarity_compensated,
    two_prod,
    two_sum,
)


def test_two_sum_exact():
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (1000,), jnp.float32) * 1e4
    b = jax.random.normal(jax.random.PRNGKey(1), (1000,), jnp.float32) * 1e-4
    s, e = two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    got = s.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


def test_two_prod_exact():
    a = jax.random.normal(jax.random.PRNGKey(0), (1000,), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (1000,), jnp.float32) * 37.3
    p, e = two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    got = p.astype(jnp.float64) + e.astype(jnp.float64)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(exact))


@pytest.mark.parametrize("n", [3, 64, 100, 1000])
def test_csum_vs_f64(n):
    # ill-conditioned sum: large alternating terms with a tiny true value
    x = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.float32) * 1e3
    x = jnp.concatenate([x, -x, jnp.asarray([1e-3], jnp.float32)])
    hi, lo = csum(x)
    truth = float(np.sum(np.asarray(x, np.float64)))
    got = float(hi) + float(lo)
    assert abs(got - truth) < 1e-9 * max(1.0, abs(truth))
    plain = float(jnp.sum(x))
    assert abs(got - truth) <= abs(plain - truth)


def test_cdot_vs_f64():
    a = jax.random.normal(jax.random.PRNGKey(3), (500,), jnp.float32) * 50
    b = jax.random.normal(jax.random.PRNGKey(4), (500,), jnp.float32) * 50
    hi, lo = cdot(a, b)
    truth = float(np.asarray(a, np.float64) @ np.asarray(b, np.float64))
    assert abs(float(hi) + float(lo) - truth) < 1e-6
    # plain f32 dot on these magnitudes misses by far more
    plain = float(a @ b)
    assert abs(float(hi) + float(lo) - truth) < abs(plain - truth) + 1e-9


@pytest.mark.parametrize("batched", [False, True])
def test_stationarity_matches_f64(batched):
    """The compensated KKT stationarity in f32 agrees with the f64 value to
    ~1e-6 even when the plain-f32 einsum floors orders of magnitude higher —
    the exact regime of a near-converged collocation NLP (residual ~1e-5,
    terms O(10))."""
    m, n = 120, 80
    key = jax.random.PRNGKey(5)
    J64 = np.asarray(jax.random.normal(key, (m, n)), np.float64) * 5.0
    lam64 = np.asarray(jax.random.normal(jax.random.PRNGKey(6), (m,)), np.float64) * 8.0
    # build grad/z so the true residual is tiny: grad = -J^T lam - z + delta
    z64 = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (n,)), np.float64)
    delta = 3e-5
    grad64 = -J64.T @ lam64 - z64 + delta
    truth = np.max(np.abs(grad64 + J64.T @ lam64 + z64))  # ~delta + f32 input rounding

    J = jnp.asarray(J64, jnp.float32)
    lam = jnp.asarray(lam64, jnp.float32)
    z = jnp.asarray(z64, jnp.float32)
    grad = jnp.asarray(grad64, jnp.float32)
    # recompute the truth from the ROUNDED f32 inputs so only accumulation
    # error is being measured
    truth32in = np.max(
        np.abs(
            np.asarray(grad, np.float64)
            + np.asarray(J, np.float64).T @ np.asarray(lam, np.float64)
            + np.asarray(z, np.float64)
        )
    )
    if batched:
        comp = stationarity_compensated(
            grad[None], J[None], lam[None], z[None]
        )[0]
    else:
        comp = stationarity_compensated(grad, J, lam, z)
    plain = jnp.max(jnp.abs(grad + J.T @ lam + z))
    assert abs(float(comp) - truth32in) < 1e-6 * (1.0 + truth32in)
    # and the compensation is load-bearing: plain f32 error dominates
    assert abs(float(plain) - truth32in) > abs(float(comp) - truth32in)


def test_cmatvec_t_batched_matches_loop():
    B, m, n = 4, 50, 30
    J = jax.random.normal(jax.random.PRNGKey(8), (B, m, n), jnp.float32)
    lam = jax.random.normal(jax.random.PRNGKey(9), (B, m), jnp.float32)
    hi, lo = cmatvec_t(J, lam)
    for b in range(B):
        hib, lob = cmatvec_t(J[b], lam[b])
        np.testing.assert_allclose(np.asarray(hi[b]), np.asarray(hib), rtol=0)
        np.testing.assert_allclose(np.asarray(lo[b]), np.asarray(lob), rtol=0)
