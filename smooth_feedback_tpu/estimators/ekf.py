"""Extended Kalman filter on Lie groups (right-Jacobian / IEKF form).

TPU-native re-design of the reference EKF (ekf.hpp:27-149): the filter state
is a plain pytree ``EKFState(g, P)``; ``predict``/``update`` are pure
functions, so fleets of filters run as ``jax.vmap`` over leading axes and
time-recursions as ``jax.lax.scan``.

Covariance propagation uses the body-frame linearization
``A = -ad(f(t, g)) + d^r f / dg`` (ekf.hpp:85-88), the signature Lie-group
correction to the textbook Riccati equation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..groups.base import LieGroup


class EKFState(NamedTuple):
    """Filter estimate and covariance."""

    g: jax.Array  # (nparams,) group element
    P: jax.Array  # (ndof, ndof) covariance


def ekf_reset(G: LieGroup, g: jax.Array, P: Optional[jax.Array] = None) -> EKFState:
    """Create a filter state (cf. EKF::reset, ekf.hpp:45-49)."""
    if P is None:
        P = jnp.eye(G.ndof, dtype=jnp.result_type(g))
    return EKFState(g=g, P=P)


def _sym(P):
    return 0.5 * (P + jnp.swapaxes(P, -1, -2))


def ekf_predict(
    G: LieGroup,
    f: Callable[[jax.Array, jax.Array], jax.Array],
    state: EKFState,
    Q: jax.Array,
    tau,
    n_steps: int = 1,
    stepper: str = "euler",
) -> EKFState:
    """Propagate the filter through dynamics ``d^r x_t = f(t, x)`` over
    ``[0, tau]`` with process covariance ``Q`` (cf. EKF::predict,
    ekf.hpp:80-103).

    ``n_steps`` fixed integration steps of size ``tau / n_steps`` (static; the
    reference's ``dt`` maps to ``n_steps = ceil(tau/dt)``).  The covariance
    steps first with the pre-step estimate, exactly like the reference's
    lockstep ordering (ekf.hpp:95-96).
    """
    g0, P0 = state
    tau = jnp.asarray(tau, dtype=P0.dtype)
    h = tau / n_steps

    def Amat(t, g):
        fv = f(t, g)
        z = jnp.zeros((G.ndof,), dtype=P0.dtype)
        J = jax.jacfwd(lambda w: f(t, G.rplus(g, w)))(z)
        return fv, -G.ad(fv) + J

    def cov_rhs(t, g, P):
        _, A = Amat(t, g)
        return A @ P + P @ A.T + Q

    def state_step(t, g):
        if stepper == "euler":
            return G.rplus(g, h * f(t, g))
        elif stepper == "rk4":
            k1 = f(t, g)
            k2 = f(t + 0.5 * h, G.rplus(g, 0.5 * h * k1))
            k3 = f(t + 0.5 * h, G.rplus(g, 0.5 * h * k2))
            k4 = f(t + h, G.rplus(g, h * k3))
            return G.rplus(g, (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4))
        raise ValueError(f"unknown stepper {stepper!r}")

    def cov_step(t, g, P):
        if stepper == "euler":
            return _sym(P + h * cov_rhs(t, g, P))
        elif stepper == "rk4":
            k1 = cov_rhs(t, g, P)
            k2 = cov_rhs(t + 0.5 * h, g, P + 0.5 * h * k1)
            k3 = cov_rhs(t + 0.5 * h, g, P + 0.5 * h * k2)
            k4 = cov_rhs(t + h, g, P + h * k3)
            return _sym(P + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4))
        raise ValueError(f"unknown stepper {stepper!r}")

    def body(carry, i):
        g, P = carry
        t = i * h
        P = cov_step(t, g, P)  # covariance first: uses pre-step g
        g = state_step(t, g)
        return (g, P), None

    with jax.default_matmul_precision("highest"):
        (g, P), _ = jax.lax.scan(body, (g0, P0), jnp.arange(n_steps))
    return EKFState(g=g, P=P)


def ekf_update(
    G: LieGroup,
    h: Callable[[jax.Array], jax.Array],
    state: EKFState,
    y: jax.Array,
    R: jax.Array,
    Y: Optional[LieGroup] = None,
) -> EKFState:
    """Measurement update with ``y = h(x) + w``, ``w ~ N(0, R)`` (cf.
    EKF::update, ekf.hpp:116-139).

    If ``Y`` is given, ``h`` maps into that group and the innovation is
    ``y (-) h(g)``; otherwise ``h`` returns a Euclidean vector.
    """
    g, P = state
    dt = P.dtype

    z = jnp.zeros((G.ndof,), dtype=dt)
    hval = h(g)
    if Y is None:
        H = jax.jacfwd(lambda w: h(G.rplus(g, w)))(z)
        innov = y - hval
    else:
        H = jax.jacfwd(lambda w: Y.rminus(h(G.rplus(g, w)), hval))(z)
        innov = Y.rminus(y, hval)

    # full-precision matmuls (TPU defaults to bf16 for f32 inputs) and the
    # Joseph-form covariance update: both are required to keep P positive
    # semidefinite through long f32 filter runs.
    with jax.default_matmul_precision("highest"):
        S = H @ P @ H.T + R
        cf = jax.scipy.linalg.cho_factor(_sym(S))
        K = jax.scipy.linalg.cho_solve(cf, H @ P).T

        g_new = G.rplus(g, K @ innov)
        IKH = jnp.eye(G.ndof, dtype=dt) - K @ H
        P_new = _sym(IKH @ P @ IKH.T + K @ R @ K.T)
    return EKFState(g=g_new, P=P_new)


class EKF:
    """Thin stateful convenience wrapper mirroring the reference class API
    (ekf.hpp:27).  For batched/jitted use prefer the functional
    ``ekf_predict`` / ``ekf_update`` with explicit ``EKFState``."""

    def __init__(self, G: LieGroup, g=None, P=None):
        self.G = G
        g = G.identity() if g is None else g
        self.state = ekf_reset(G, g, P)

    def reset(self, g, P):
        self.state = EKFState(g=g, P=P)

    @property
    def estimate(self):
        return self.state.g

    @property
    def covariance(self):
        return self.state.P

    def predict(self, f, Q, tau, n_steps: int = 1, stepper: str = "euler"):
        self.state = ekf_predict(self.G, f, self.state, Q, tau, n_steps, stepper)

    def update(self, h, y, R, Y: Optional[LieGroup] = None):
        self.state = ekf_update(self.G, h, self.state, y, R, Y)
