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
from smooth_feedback_tpu.groups import SE2, SO2, SO3, Rn


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


# ----------------------------------------------------- square-root / iterated


def test_sqrt_ekf_matches_standard():
    """Square-root predict+update agrees with the covariance-form filter
    (f64): same estimate, S S' == P."""
    from smooth_feedback_tpu.estimators import (
        sqrt_ekf_predict, sqrt_ekf_reset, sqrt_ekf_update,
    )

    G = SE2
    rng = np.random.default_rng(3)
    g0 = G.exp(jnp.asarray(rng.standard_normal(3) * 0.3))
    P0 = np.eye(3) + 0.2 * np.diag(rng.random(3))
    Q = 0.05 * np.eye(3)
    R = 0.04 * np.eye(2)
    f = lambda t, g: jnp.array([1.0, 0.0, 0.4])
    h = lambda g: g[:2]  # position measurement
    y = jnp.asarray([0.3, -0.1])

    # sqrt predict uses the discrete array form Phi P Phi' + hQ, the
    # covariance form the continuous-Euler P + h(AP+PA'+Q): they differ at
    # O(h^2) per step, so compare in the fine-step limit
    st = ekf_reset(G, g0, jnp.asarray(P0))
    st = ekf_predict(G, f, st, jnp.asarray(Q), 0.5, n_steps=400)
    st = ekf_update(G, h, st, y, jnp.asarray(R))

    sq = sqrt_ekf_reset(G, g0, jnp.asarray(P0))
    sq = sqrt_ekf_predict(G, f, sq, jnp.asarray(Q), 0.5, n_steps=400)
    sq = sqrt_ekf_update(G, h, sq, y, jnp.asarray(R))

    np.testing.assert_allclose(np.asarray(sq.g), np.asarray(st.g), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(sq.S @ sq.S.T), np.asarray(st.P), atol=2e-4
    )

    # update-only equivalence is exact (same linearization point)
    stu = ekf_update(G, h, ekf_reset(G, g0, jnp.asarray(P0)), y, jnp.asarray(R))
    squ = sqrt_ekf_update(G, h, sqrt_ekf_reset(G, g0, jnp.asarray(P0)), y, jnp.asarray(R))
    np.testing.assert_allclose(np.asarray(squ.g), np.asarray(stu.g), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(squ.S @ squ.S.T), np.asarray(stu.P), atol=1e-12
    )


def test_sqrt_ekf_f32_long_run_psd():
    """1000 f32 predict/update cycles keep the factor finite (P = S S' is
    PSD by construction — the TPU fleet motivation for the sqrt form)."""
    from smooth_feedback_tpu.estimators import (
        SqrtEKFState, sqrt_ekf_predict, sqrt_ekf_reset, sqrt_ekf_update,
    )

    G = SE2
    f32 = jnp.float32
    f = lambda t, g: jnp.array([1.0, 0.0, 0.4], f32)
    h = lambda g: g[:2]
    Q = (0.05 * jnp.eye(3)).astype(f32)
    R = (0.04 * jnp.eye(2)).astype(f32)

    def cycle(st, y):
        st = sqrt_ekf_predict(G, f, st, Q, 0.05, n_steps=1)
        st = sqrt_ekf_update(G, h, st, y, R)
        return st, jnp.diag(st.S)

    st0 = sqrt_ekf_reset(G, G.identity().astype(f32), jnp.eye(3, dtype=f32))
    ys = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (1000, 2), f32)
    st, diags = jax.lax.scan(cycle, st0, ys)
    assert np.isfinite(np.asarray(st.S)).all()
    # the factor's diagonal stays strictly positive: P strictly PD throughout
    assert float(jnp.min(diags)) > 0.0


def test_sqrt_ekf_singular_psd_noise():
    """PSD-but-singular Q (zero process noise on some states) and rank-
    deficient reset P must not poison the square-root filter with NaN factors
    (cholesky of a singular matrix is NaN; the eigh-based sqrt handles the
    full PSD cone).  Cross-checked against the covariance-form filter, which
    accepts singular Q natively."""
    from smooth_feedback_tpu.estimators import (
        sqrt_ekf_predict, sqrt_ekf_reset, sqrt_ekf_update,
    )

    G = SE2
    Q = jnp.diag(jnp.asarray([0.05, 0.0, 0.0]))  # noise only on x
    R = jnp.diag(jnp.asarray([0.04, 0.0]))  # exact second measurement channel
    P0 = jnp.diag(jnp.asarray([1.0, 1.0, 0.0]))  # heading known exactly
    f = lambda t, g: jnp.array([1.0, 0.0, 0.4])
    h = lambda g: g[:2]
    y = jnp.asarray([0.3, -0.1])

    sq = sqrt_ekf_reset(G, G.identity(), P0)
    assert np.isfinite(np.asarray(sq.S)).all()
    np.testing.assert_allclose(np.asarray(sq.S @ sq.S.T), np.asarray(P0), atol=1e-12)

    sq = sqrt_ekf_predict(G, f, sq, Q, 0.5, n_steps=10)
    assert np.isfinite(np.asarray(sq.S)).all()
    sq = sqrt_ekf_update(G, h, sq, y, R)
    assert np.isfinite(np.asarray(sq.S)).all()
    assert np.isfinite(np.asarray(sq.g)).all()

    st = ekf_reset(G, G.identity(), P0)
    st = ekf_predict(G, f, st, Q, 0.5, n_steps=10)
    st = ekf_update(G, h, st, y, R)
    # discrete vs continuous-Euler propagation differ at O(h^2) per step
    np.testing.assert_allclose(np.asarray(sq.g), np.asarray(st.g), atol=2e-2)
    np.testing.assert_allclose(np.asarray(sq.S @ sq.S.T), np.asarray(st.P), atol=2e-2)


def test_iterated_update_one_iter_matches_plain():
    from smooth_feedback_tpu.estimators import ekf_update_iterated

    G = SO3
    g0 = G.exp(jnp.asarray([0.2, -0.1, 0.3]))
    P = 0.3 * jnp.eye(3)
    R = 0.01 * jnp.eye(3)
    h = lambda g: G.log(g)
    y = jnp.asarray([0.25, -0.05, 0.2])

    st = EKFState(g=g0, P=P)
    a = ekf_update(G, h, st, y, R)
    b = ekf_update_iterated(G, h, st, y, R, iters=1)
    np.testing.assert_allclose(np.asarray(b.g), np.asarray(a.g), atol=1e-12)
    np.testing.assert_allclose(np.asarray(b.P), np.asarray(a.P), atol=1e-12)


def test_iterated_update_improves_nonlinear():
    """Strongly nonlinear (range) measurement: iteration reduces the
    post-update measurement residual vs the single-sweep EKF."""
    from smooth_feedback_tpu.estimators import ekf_update_iterated

    G = Rn(1)
    h = lambda g: jnp.exp(g)  # strongly convex measurement
    y = jnp.asarray([float(np.exp(2.0))])
    st = EKFState(g=jnp.zeros(1), P=10.0 * jnp.eye(1))
    R = 1e-4 * jnp.eye(1)

    a = ekf_update(G, h, st, y, R)  # single sweep overshoots badly
    b = ekf_update_iterated(G, h, st, y, R, iters=8)
    res_a = float(jnp.abs(h(a.g) - y)[0])
    res_b = float(jnp.abs(h(b.g) - y)[0])
    assert res_b <= res_a * 1e-2, (res_a, res_b)
    np.testing.assert_allclose(float(b.g[0]), 2.0, atol=1e-2)


# ---------------------------------------------------------------------------
# fleet (batch-trailing) layout
# ---------------------------------------------------------------------------


def _fleet_setup(G, B=32, key=7):
    keys = jax.random.split(jax.random.PRNGKey(key), B)
    g0 = jax.vmap(lambda k: G.random(k, 0.3))(keys)
    P0 = jnp.stack(
        [
            jnp.eye(G.ndof) * (1.0 + 0.1 * i) + 0.05 * jnp.ones((G.ndof, G.ndof))
            for i in range(B)
        ]
    )
    return g0, P0


@pytest.mark.parametrize("G", [SO3, SE2], ids=["SO3", "SE2"])
@pytest.mark.parametrize("stepper", ["euler", "rk4"])
def test_fleet_predict_matches_vmap(G, stepper):
    """ekf_fleet_predict (batch-trailing covariance layout) is exactly
    jax.vmap(ekf_predict)."""
    from smooth_feedback_tpu.estimators import (
        ekf_fleet_predict,
        ekf_fleet_reset,
        ekf_fleet_states,
    )

    B = 32
    g0, P0 = _fleet_setup(G, B)
    twist = 0.1 * jnp.arange(1, G.ndof + 1, dtype=jnp.float64)
    f = lambda t, g: twist * (1.0 + 0.5 * jnp.sin(t)) + 0.1 * G.log(g)
    Q = 0.01 * jnp.eye(G.ndof) + 0.002 * jnp.ones((G.ndof, G.ndof))

    fleet = ekf_fleet_reset(G, g0, P0)
    fleet = jax.jit(
        lambda s: ekf_fleet_predict(G, f, s, Q, 0.3, n_steps=4, stepper=stepper),
    )(fleet)
    got = ekf_fleet_states(G, fleet)

    ref = jax.jit(
        jax.vmap(
            lambda gi, Pi: ekf_predict(
                G, f, EKFState(g=gi, P=Pi), Q, 0.3, n_steps=4, stepper=stepper
            )
        )
    )(g0, P0)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P), atol=1e-12)


@pytest.mark.parametrize("G", [SO3, SE2], ids=["SO3", "SE2"])
def test_fleet_update_matches_vmap(G):
    """ekf_fleet_update == jax.vmap(ekf_update), Euclidean measurement."""
    from smooth_feedback_tpu.estimators import (
        ekf_fleet_reset,
        ekf_fleet_states,
        ekf_fleet_update,
    )

    B = 32
    g0, P0 = _fleet_setup(G, B, key=11)
    meas = lambda g: jnp.tanh(G.log(g)) + 0.3 * G.log(g)
    R = 0.05 * jnp.eye(G.ndof) + 0.01 * jnp.ones((G.ndof, G.ndof))
    y = jax.vmap(meas)(g0) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(3), (B, G.ndof)
    )

    fleet = ekf_fleet_reset(G, g0, P0)
    got = ekf_fleet_states(
        G, jax.jit(lambda s: ekf_fleet_update(G, meas, s, y, R))(fleet)
    )
    ref = jax.jit(
        jax.vmap(lambda gi, Pi, yi: ekf_update(G, meas, EKFState(g=gi, P=Pi), yi, R))
    )(g0, P0, y)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P), atol=1e-12)


def test_fleet_update_manifold_measurement():
    """Group-valued measurements (Y != None) match the vmapped path."""
    from smooth_feedback_tpu.estimators import (
        ekf_fleet_reset,
        ekf_fleet_states,
        ekf_fleet_update,
    )

    G = SE2
    B = 16
    g0, P0 = _fleet_setup(G, B, key=13)
    meas = lambda g: g  # direct pose measurement in SE(2)
    R = 0.05 * jnp.eye(G.ndof)
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (B, G.ndof))
    y = jax.vmap(lambda gi, wi: G.rplus(gi, wi))(g0, noise)

    fleet = ekf_fleet_reset(G, g0, P0)
    got = ekf_fleet_states(
        G, jax.jit(lambda s: ekf_fleet_update(G, meas, s, y, R, Y=G))(fleet)
    )
    ref = jax.jit(
        jax.vmap(
            lambda gi, Pi, yi: ekf_update(G, meas, EKFState(g=gi, P=Pi), yi, R, Y=G)
        )
    )(g0, P0, y)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P), atol=1e-12)


def test_fleet_per_member_noise():
    """Per-member (B, n, n) Q and R are accepted and match vmap."""
    from smooth_feedback_tpu.estimators import (
        ekf_fleet_predict,
        ekf_fleet_reset,
        ekf_fleet_states,
        ekf_fleet_update,
    )

    G = SO3
    B = 8
    g0, P0 = _fleet_setup(G, B, key=17)
    f = lambda t, g: 0.2 * G.log(g)
    meas = lambda g: G.log(g)
    Qs = jnp.stack([(0.01 + 0.002 * i) * jnp.eye(G.ndof) for i in range(B)])
    Rs = jnp.stack([(0.05 + 0.01 * i) * jnp.eye(G.ndof) for i in range(B)])
    y = jax.vmap(meas)(g0) + 0.05

    fleet = ekf_fleet_reset(G, g0, P0)
    fleet = ekf_fleet_predict(G, f, fleet, Qs, 0.2, n_steps=2)
    got = ekf_fleet_states(G, ekf_fleet_update(G, meas, fleet, y, Rs))

    def one(gi, Pi, Qi, Ri, yi):
        s = ekf_predict(G, f, EKFState(g=gi, P=Pi), Qi, 0.2, n_steps=2)
        return ekf_update(G, meas, s, yi, Ri)

    ref = jax.vmap(one)(g0, P0, Qs, Rs, y)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P), atol=1e-12)


@pytest.mark.parametrize("G", [SO3, SE2], ids=["SO3", "SE2"])
def test_sqrt_fleet_matches_vmap(G):
    """sqrt_ekf_fleet_predict/update (trailing Householder QR array form)
    match jax.vmap(sqrt_ekf_predict/sqrt_ekf_update) exactly (unique
    sign-normalized factors)."""
    from smooth_feedback_tpu.estimators import (
        SqrtEKFState,
        sqrt_ekf_fleet_predict,
        sqrt_ekf_fleet_reset,
        sqrt_ekf_fleet_update,
        sqrt_ekf_predict,
        sqrt_ekf_reset,
        sqrt_ekf_update,
    )

    B = 24
    g0, P0 = _fleet_setup(G, B, key=23)
    twist = 0.1 * jnp.arange(1, G.ndof + 1, dtype=jnp.float64)
    f = lambda t, g: twist + 0.1 * G.log(g)
    meas = lambda g: jnp.tanh(G.log(g))
    Q = 0.01 * jnp.eye(G.ndof) + 0.002 * jnp.ones((G.ndof, G.ndof))
    R = 0.05 * jnp.eye(G.ndof)
    y = jax.vmap(meas)(g0) + 0.05

    fleet = sqrt_ekf_fleet_reset(G, g0, P0)
    fleet = jax.jit(
        lambda s: sqrt_ekf_fleet_predict(G, f, s, Q, 0.3, n_steps=3)
    )(fleet)
    fleet = jax.jit(lambda s: sqrt_ekf_fleet_update(G, meas, s, y, R))(fleet)

    def one(gi, Pi, yi):
        s = sqrt_ekf_reset(G, gi, Pi)
        s = sqrt_ekf_predict(G, f, s, Q, 0.3, n_steps=3)
        s = sqrt_ekf_update(G, meas, s, yi, R)
        return s.g, s.S

    g_ref, S_ref = jax.jit(jax.vmap(one))(g0, P0, y)
    np.testing.assert_allclose(np.asarray(fleet.g), np.asarray(g_ref), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(fleet.St, -1, 0)), np.asarray(S_ref), atol=1e-10
    )


def test_sqrt_fleet_manifold_measurement():
    from smooth_feedback_tpu.estimators import (
        sqrt_ekf_fleet_reset,
        sqrt_ekf_fleet_update,
        sqrt_ekf_reset,
        sqrt_ekf_update,
    )

    G = SE2
    B = 8
    g0, P0 = _fleet_setup(G, B, key=29)
    meas = lambda g: g
    R = 0.05 * jnp.eye(G.ndof)
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(7), (B, G.ndof))
    y = jax.vmap(lambda gi, wi: G.rplus(gi, wi))(g0, noise)

    fleet = sqrt_ekf_fleet_reset(G, g0, P0)
    fleet = jax.jit(lambda s: sqrt_ekf_fleet_update(G, meas, s, y, R, Y=G))(fleet)

    def one(gi, Pi, yi):
        s = sqrt_ekf_update(G, meas, sqrt_ekf_reset(G, gi, Pi), yi, R, Y=G)
        return s.g, s.S

    g_ref, S_ref = jax.jit(jax.vmap(one))(g0, P0, y)
    np.testing.assert_allclose(np.asarray(fleet.g), np.asarray(g_ref), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(fleet.St, -1, 0)), np.asarray(S_ref), atol=1e-10
    )


def test_fleet_per_member_noise_B_equals_ndof():
    """Regression: per-member (B, n, n) noise with B == ndof used to be
    silently misread as an already-trailing (n, n, B) stack (and the sqrt
    form resolved the ambiguity the opposite way).  3-D noise is now always
    batch-leading; both forms must match vmap exactly at B == n."""
    from smooth_feedback_tpu.estimators import (
        ekf_fleet_predict,
        ekf_fleet_reset,
        ekf_fleet_states,
        ekf_fleet_update,
        sqrt_ekf_fleet_predict,
        sqrt_ekf_fleet_reset,
    )

    G = SO3
    B = G.ndof  # the ambiguous case
    g0, P0 = _fleet_setup(G, B, key=37)
    f = lambda t, g: 0.2 * G.log(g)
    meas = lambda g: G.log(g)
    Qs = jnp.stack([(0.01 + 0.05 * i) * jnp.eye(G.ndof) for i in range(B)])
    Rs = jnp.stack([(0.05 + 0.02 * i) * jnp.eye(G.ndof) for i in range(B)])
    y = jax.vmap(meas)(g0) + 0.05

    fleet = ekf_fleet_reset(G, g0, P0)
    fleet = ekf_fleet_predict(G, f, fleet, Qs, 0.2, n_steps=2)
    got = ekf_fleet_states(G, ekf_fleet_update(G, meas, fleet, y, Rs))

    def one(gi, Pi, Qi, Ri, yi):
        s = ekf_predict(G, f, EKFState(g=gi, P=Pi), Qi, 0.2, n_steps=2)
        return ekf_update(G, meas, s, yi, Ri)

    ref = jax.vmap(one)(g0, P0, Qs, Rs, y)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P), atol=1e-12)

    # sqrt form: same convention
    from smooth_feedback_tpu.estimators import sqrt_ekf_predict, sqrt_ekf_reset

    sq = sqrt_ekf_fleet_reset(G, g0, P0)
    sq = sqrt_ekf_fleet_predict(G, f, sq, Qs, 0.2, n_steps=2)

    def one_sq(gi, Pi, Qi):
        s = sqrt_ekf_predict(G, f, sqrt_ekf_reset(G, gi, Pi), Qi, 0.2, n_steps=2)
        return s.g, s.S

    g_ref, S_ref = jax.vmap(one_sq)(g0, P0, Qs)
    np.testing.assert_allclose(np.asarray(sq.g), np.asarray(g_ref), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(jnp.moveaxis(sq.St, -1, 0)), np.asarray(S_ref), atol=1e-12
    )


@pytest.mark.parametrize("G", [SO3, SE2], ids=["SO3", "SE2"])
def test_fleet_update_iterated_matches_vmap(G):
    """ekf_fleet_update_iterated == jax.vmap(ekf_update_iterated), and
    iters=1 reproduces the plain fleet update exactly."""
    from smooth_feedback_tpu.estimators import (
        ekf_fleet_reset,
        ekf_fleet_states,
        ekf_fleet_update,
        ekf_fleet_update_iterated,
        ekf_update_iterated,
    )

    B = 24
    g0, P0 = _fleet_setup(G, B, key=21)
    meas = lambda g: jnp.tanh(G.log(g)) + 0.3 * G.log(g) ** 2
    R = 0.05 * jnp.eye(G.ndof) + 0.01 * jnp.ones((G.ndof, G.ndof))
    y = jax.vmap(meas)(g0) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(22), (B, G.ndof)
    )

    fleet = ekf_fleet_reset(G, g0, P0)
    got = ekf_fleet_states(
        G,
        jax.jit(lambda s: ekf_fleet_update_iterated(G, meas, s, y, R, iters=3))(
            fleet
        ),
    )
    ref = jax.jit(
        jax.vmap(
            lambda gi, Pi, yi: ekf_update_iterated(
                G, meas, EKFState(g=gi, P=Pi), yi, R, iters=3
            )
        )
    )(g0, P0, y)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g), atol=1e-12)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P), atol=1e-12)

    one = ekf_fleet_states(
        G, ekf_fleet_update_iterated(G, meas, fleet, y, R, iters=1)
    )
    plain = ekf_fleet_states(G, ekf_fleet_update(G, meas, fleet, y, R))
    np.testing.assert_allclose(np.asarray(one.g), np.asarray(plain.g), atol=1e-14)
    np.testing.assert_allclose(np.asarray(one.P), np.asarray(plain.P), atol=1e-14)


def test_fleet_update_iterated_manifold():
    """Iterated fleet update with group-valued measurements (Y != None)."""
    from smooth_feedback_tpu.estimators import (
        ekf_fleet_reset,
        ekf_fleet_states,
        ekf_fleet_update_iterated,
        ekf_update_iterated,
    )

    G, Y = SE2, SO2
    B = 16
    g0, P0 = _fleet_setup(G, B, key=23)
    meas = lambda g: SO2.exp(G.log(g)[2:3] + 0.2 * G.log(g)[0:1] ** 2)
    R = 0.02 * jnp.eye(1)
    y = jax.vmap(
        lambda gi, k: Y.rplus(meas(gi), 0.1 * jax.random.normal(k, (1,)))
    )(g0, jax.random.split(jax.random.PRNGKey(24), B))

    fleet = ekf_fleet_reset(G, g0, P0)
    got = ekf_fleet_states(
        G,
        ekf_fleet_update_iterated(G, meas, fleet, y, R, Y=Y, iters=4),
    )
    ref = jax.vmap(
        lambda gi, Pi, yi: ekf_update_iterated(
            G, meas, EKFState(g=gi, P=Pi), yi, R, Y=Y, iters=4
        )
    )(g0, P0, y)
    np.testing.assert_allclose(np.asarray(got.g), np.asarray(ref.g), atol=1e-11)
    np.testing.assert_allclose(np.asarray(got.P), np.asarray(ref.P), atol=1e-11)
