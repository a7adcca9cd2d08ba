"""EKF tests mirroring the reference oracles (tests/test_ekf.cpp):

- linear-system update against the textbook Kalman equations
- linear-system predict against the matrix-exponential exact solution
- Lie-group (SO3) smoke + convergence of a full predict/update loop
- batched filters via vmap
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.linalg import expm

from smooth_feedback_tpu.estimators import EKFState, ekf_predict, ekf_reset, ekf_update
from smooth_feedback_tpu.groups import SE2, SO3, Rn


def test_update_linear():
    """Update on a random linear system equals the Kalman equations
    (reference test_ekf.cpp:50-103)."""
    rng = np.random.default_rng(0)
    for nx, ny in [(3, 3), (10, 3), (3, 10)]:
        G = Rn(nx)
        x = rng.standard_normal(nx)
        xhat = rng.standard_normal(nx)
        P = np.diag(rng.standard_normal(nx) + 1.1 + 1.0)
        H = rng.standard_normal((ny, nx))
        h0 = rng.standard_normal(ny)
        R = np.diag(rng.standard_normal(ny) + 1.1 + 1.0)

        state = ekf_reset(G, jnp.asarray(xhat), jnp.asarray(P))
        new = ekf_update(
            G, lambda g: jnp.asarray(H) @ g + jnp.asarray(h0), state, jnp.asarray(H @ x + h0), jnp.asarray(R)
        )

        S = H @ P @ H.T + R
        K = P @ H.T @ np.linalg.inv(S)
        x_ref = xhat + K @ (H @ x - H @ xhat)
        P_ref = (np.eye(nx) - K @ H) @ P

        np.testing.assert_allclose(new.g, x_ref, atol=1e-10)
        np.testing.assert_allclose(new.P, 0.5 * (P_ref + P_ref.T), atol=1e-10)


def test_predict_linear():
    """Predict on x' = Ax matches expm(A tau) (reference test_ekf.cpp:105-153).

    Uses rk4 + fine steps like the reference (runge_kutta4, dt=1e-3)."""
    rng = np.random.default_rng(1)
    for nx in [3, 6]:
        G = Rn(nx)
        xhat = rng.standard_normal(nx)
        P = np.diag(rng.standard_normal(nx) + 2.1)
        A = rng.standard_normal((nx, nx))
        Q = np.zeros((nx, nx))
        tau = 0.7

        state = ekf_reset(G, jnp.asarray(xhat), jnp.asarray(P))
        new = ekf_predict(
            G,
            lambda t, g: jnp.asarray(A) @ g,
            state,
            jnp.asarray(Q),
            tau,
            n_steps=700,
            stepper="rk4",
        )

        F = expm(A * tau)
        np.testing.assert_allclose(new.g, F @ xhat, rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(new.P, F @ P @ F.T, rtol=2e-3, atol=1e-5)


def test_predict_constant():
    """Constant dynamics integrate exactly (reference test_ekf.cpp:155-180)."""
    G = Rn(2)
    rng = np.random.default_rng(2)
    xhat = rng.standard_normal(2)
    b = rng.standard_normal(2)
    state = ekf_reset(G, jnp.asarray(xhat))
    new = ekf_predict(G, lambda t, g: jnp.asarray(b), state, jnp.eye(2), 0.7, n_steps=2)
    np.testing.assert_allclose(new.g, xhat + 0.7 * b, atol=1e-12)


def test_so3_smoke():
    """SO(3) predict/update runs and stays finite (test_ekf.cpp:31-48)."""
    state = ekf_reset(SO3, SO3.identity())
    dyn = lambda t, g: jnp.array([1.0, 0.0, 0.0])
    meas = lambda g: SO3.Ad(g) @ jnp.array([0.0, 0.0, 1.0])  # rotate e_z
    Q = jnp.eye(3)

    state = ekf_predict(SO3, dyn, state, Q, 1.0, n_steps=2)
    state = ekf_update(SO3, meas, state, jnp.array([0.0, 1.0, 0.0]), Q)
    state = ekf_predict(SO3, dyn, state, Q, 1.0, n_steps=10)
    assert np.isfinite(np.asarray(state.g)).all()
    assert np.isfinite(np.asarray(state.P)).all()


def test_se2_localization_converges():
    """A full SE(2) localization loop converges to the true pose (the workload
    of BASELINE config 3)."""
    true_pose = SE2.exp(jnp.array([1.0, 2.0, 0.5]))
    landmarks = jnp.array([[2.0, 1.0], [-1.0, 3.0], [0.5, -2.0]])

    def meas(g):
        # landmark positions in body frame
        inv = SE2.inverse(g)
        R = jnp.array([[inv[2], -inv[3]], [inv[3], inv[2]]])
        return (landmarks @ R.T + inv[:2]).ravel()

    y = meas(true_pose)
    state = ekf_reset(SE2, SE2.identity(), 10 * jnp.eye(3))
    R_noise = 1e-4 * jnp.eye(6)
    for _ in range(20):
        # iterated update (reset covariance -> Gauss-Newton on the pose)
        state = ekf_update(SE2, meas, ekf_reset(SE2, state.g, 10 * jnp.eye(3)), y, R_noise)
    np.testing.assert_allclose(state.g, true_pose, atol=1e-6)


def test_vmap_batch_of_filters():
    """A fleet of filters advances independently under vmap."""
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    g0 = jax.vmap(lambda k: SO3.random(k, scale=0.1))(keys)
    P0 = jnp.tile(jnp.eye(3), (B, 1, 1))
    states = EKFState(g=g0, P=P0)

    dyn = lambda t, g: jnp.array([0.1, 0.2, -0.1])
    step = jax.jit(
        jax.vmap(lambda s: ekf_predict(SO3, dyn, s, jnp.eye(3) * 0.01, 0.1, n_steps=2))
    )
    new = step(states)
    assert new.g.shape == (B, 4)
    assert new.P.shape == (B, 3, 3)
    # all filters moved by the same body-frame increment from different anchors
    single = ekf_predict(
        SO3, dyn, EKFState(g=g0[3], P=P0[3]), jnp.eye(3) * 0.01, 0.1, n_steps=2
    )
    np.testing.assert_allclose(new.g[3], single.g, atol=1e-12)
