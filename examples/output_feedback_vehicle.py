#!/usr/bin/env python
"""Output-feedback safe control: EKF -> MPC -> ASIF in one jitted loop.

Composition showcase beyond the reference's examples (which each exercise
one component): the SE(2) x R^3 vehicle of mpc_asif_vehicle.cpp is driven
from NOISY landmark + velocity measurements.  Each step runs

    EKF update (landmarks)  ->  MPC on the ESTIMATE  ->  ASIF safety filter
    ->  plant step with process noise  ->  EKF predict with the applied u

entirely inside one `lax.scan`, so estimator, controller, and safety filter
compile into a single XLA program.  Safety (barrier h >= 0) is asserted on
the TRUE state — the filter has to hold the margin through estimation error.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.controllers import MPCParams, MPCWeights, make_mpc_step
from smooth_feedback_tpu.controllers.asif import (
    ASIFilterParams,
    ASIFtoQPParams,
    make_asif_step,
)
from smooth_feedback_tpu.estimators import ekf_predict, ekf_reset, ekf_update
from smooth_feedback_tpu.groups import SE2, Bundle, Rn
from smooth_feedback_tpu.qp import QPSolverParams
from smooth_feedback_tpu.utils.bounds import ManifoldBounds

X = Bundle(SE2, Rn(3))  # pose + body velocity (vx, vy, wz)
U = Rn(2)

LANDMARKS = jnp.array([[3.0, 1.0], [-2.0, 4.0], [1.0, -3.0], [4.0, -1.0]])


def f(x, u):
    """Vehicle dynamics (mpc_asif_vehicle.cpp:42-51)."""
    v = x[4:]
    return jnp.stack(
        [v[0], v[1], v[2], -0.2 * v[0] + u[0], jnp.zeros(()), -0.4 * v[2] + u[1]]
    )


def meas(x):
    """Body-frame landmark positions + measured body velocity."""
    inv = SE2.inverse(x[:4])
    R = jnp.array([[inv[2], -inv[3]], [inv[3], inv[2]]])
    return jnp.concatenate([(LANDMARKS @ R.T + inv[:2]).ravel(), x[4:]])


def main(steps: int = 800, K_mpc: int = 30, K_asif: int = 50):
    vdes = jnp.array([1.0, 0.0, 0.4])
    base = jnp.concatenate(
        [jnp.array([2.5, 0.0]), jnp.array([jnp.cos(jnp.pi / 2), jnp.sin(jnp.pi / 2)])]
    )

    def xdes(t):
        return jnp.concatenate([SE2.rplus(base, t * vdes), vdes])

    dxdes = lambda t: jnp.concatenate([vdes, jnp.zeros(3)])
    udes = lambda t: jnp.zeros(2)

    mpc_step, mpc_ws = make_mpc_step(
        X, U, f, xdes, udes, dxdes=dxdes,
        weights=MPCWeights(Q=jnp.eye(6), Qtf=0.1 * jnp.eye(6), R=jnp.eye(2)),
        params=MPCParams(K=K_mpc, tf=5.0, qp=QPSolverParams(polish=False)),
        cr=lambda x, u: u,
        crl=jnp.array([-0.5, -0.5]),
        cru=jnp.array([0.5, 0.5]),
    )

    def h(t, x):
        d = x[:2] - jnp.array([0.0, -2.3])
        return jnp.array([jnp.linalg.norm(d) - 0.7])

    def bu(t, x):
        return jnp.stack([0.2 * x[4], -jnp.asarray(0.5)])

    asif_step, asif_ws = make_asif_step(
        X, U, f, h, bu,
        params=ASIFilterParams(
            T=2.5,
            asif=ASIFtoQPParams(K=K_asif, dt=0.05, alpha=1.0, relax_cost=100.0),
            qp=QPSolverParams(polish=False),
        ),
        W_u=jnp.array([20.0, 1.0]),
        ulim=ManifoldBounds(
            A=jnp.eye(2), c=jnp.zeros(2),
            l=jnp.array([-0.2, -0.5]), u=jnp.array([0.5, 0.5]),
        ),
    )

    dt = 0.025
    Q = jnp.diag(jnp.array([1e-4, 1e-4, 1e-4, 1e-3, 1e-6, 1e-3]))
    R_meas = jnp.diag(jnp.concatenate([jnp.full(8, 1e-3), jnp.full(3, 1e-3)]))

    @jax.jit
    def rollout(x0_true, est0, mws, aws, key):
        def body(carry, i):
            x, est, mws, aws, k = carry
            t = i * dt
            # measure the TRUE state, correct the estimate
            k, km, kw = jax.random.split(k, 3)
            y = meas(x) + 0.03 * jax.random.normal(km, (11,))
            est = ekf_update(X, meas, est, y, R_meas)
            # control from the ESTIMATE
            m = mpc_step(mws, t, est.g)
            a = asif_step(aws, est.g, m.u)
            # plant step with process noise on the velocity states
            w = 0.02 * jax.random.normal(kw, (6,)).at[:3].set(0.0)
            x = X.rplus(x, dt * f(x, a.u) + jnp.sqrt(dt) * w)
            # predict through the applied input
            est = ekf_predict(X, lambda t_, g: f(g, a.u), est, Q, dt)
            err = X.rminus(est.g, x)
            return (x, est, m.warmstart, a.warmstart, k), (
                x, a.u, h(t, x)[0], jnp.linalg.norm(err),
            )

        return jax.lax.scan(body, (x0_true, est0, mws, aws, key), jnp.arange(steps))

    x0_true = X.identity()
    est0 = ekf_reset(
        X, X.rplus(x0_true, jnp.array([0.3, -0.3, 0.2, 0.0, 0.0, 0.0])), 0.5 * jnp.eye(6)
    )

    t0 = time.perf_counter()
    _, (xs, us, hs, errs) = rollout(x0_true, est0, mpc_ws, asif_ws, jax.random.PRNGKey(0))
    jax.block_until_ready(xs)
    print(f"wall: {time.perf_counter() - t0:.1f}s for {steps} EKF+MPC+ASIF steps")
    print(f"min barrier value on TRUE state: {float(jnp.min(hs)):+.3f} (safe iff > 0)")
    print(f"estimation error: initial {float(errs[0]):.3f} -> final {float(errs[-1]):.4f}")
    for i in range(0, steps, max(1, steps // 5)):
        print(f"t={i * dt:5.1f}: pos=({float(xs[i, 0]):+.2f},{float(xs[i, 1]):+.2f}) "
              f"h={float(hs[i]):+.2f} esterr={float(errs[i]):.3f}")
    assert float(jnp.min(hs)) > 0.0, "safety violated under output feedback"
    assert float(errs[-1]) < float(errs[0]), "EKF did not reduce estimation error"


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
