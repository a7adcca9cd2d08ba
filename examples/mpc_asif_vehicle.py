#!/usr/bin/env python
"""SE(2) vehicle: MPC tracking + ASIF safety filter with an obstacle.

Port of the workload of the reference example mpc_asif_vehicle.cpp: a
kinematic vehicle on X = SE(2) x R^3 (pose + body velocities) tracks a screw
trajectory with MPC while an ASIF filter enforces distance >= 0.7 from an
obstacle at (0, -2.3), overriding the MPC input when needed.
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
from smooth_feedback_tpu.groups import SE2, Bundle, Rn
from smooth_feedback_tpu.qp import QPSolverParams
from smooth_feedback_tpu.utils.bounds import ManifoldBounds

X = Bundle(SE2, Rn(3))  # pose + body velocity (vx, vy, wz)
U = Rn(2)


def f(x, u):
    """Vehicle dynamics (mpc_asif_vehicle.cpp:42-51)."""
    v = x[4:]
    return jnp.stack(
        [v[0], v[1], v[2], -0.2 * v[0] + u[0], jnp.zeros(()), -0.4 * v[2] + u[1]]
    )


def main(steps: int = 800, K_mpc: int = 30, K_asif: int = 50):
    vdes = jnp.array([1.0, 0.0, 0.4])
    base = jnp.concatenate(
        [jnp.array([2.5, 0.0]), jnp.array([jnp.cos(jnp.pi / 2), jnp.sin(jnp.pi / 2)])]
    )

    def xdes(t):
        pose = SE2.rplus(base, t * vdes)
        return jnp.concatenate([pose, vdes])

    def dxdes(t):
        return jnp.concatenate([vdes, jnp.zeros(3)])

    udes = lambda t: jnp.zeros(2)

    mpc_step, mpc_ws = make_mpc_step(
        X, U, f, xdes, udes, dxdes=dxdes,
        weights=MPCWeights(Q=jnp.eye(6), Qtf=0.1 * jnp.eye(6), R=jnp.eye(2)),
        params=MPCParams(K=K_mpc, tf=5.0, qp=QPSolverParams(polish=False)),
        cr=lambda x, u: u,
        crl=jnp.array([-0.5, -0.5]),
        cru=jnp.array([0.5, 0.5]),
    )

    # safe set: distance from the obstacle at (0, -2.3) at least 0.7
    def h(t, x):
        d = x[:2] - jnp.array([0.0, -2.3])
        return jnp.array([jnp.linalg.norm(d) - 0.7])

    # backup controller: slow down and turn away
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

    @jax.jit
    def rollout(x0, mws, aws):
        def body(carry, i):
            x, mws, aws = carry
            t = i * dt
            m = mpc_step(mws, t, x)
            a = asif_step(aws, x, m.u)
            x = X.rplus(x, dt * f(x, a.u))
            return (x, m.warmstart, a.warmstart), (x, m.u, a.u, h(t, x)[0])

        return jax.lax.scan(body, (x0, mws, aws), jnp.arange(steps))

    x0 = X.identity()
    t0 = time.perf_counter()
    (_, _, _), (xs, u_mpc, u_asif, hs) = rollout(x0, mpc_ws, asif_ws)
    jax.block_until_ready(xs)
    print(f"wall: {time.perf_counter() - t0:.1f}s for {steps} MPC+ASIF steps")
    print(f"min barrier value: {float(jnp.min(hs)):+.3f} (safe iff > 0)")
    diff = np.abs(np.asarray(u_mpc) - np.asarray(u_asif)).max(axis=1)
    print(f"ASIF interventions: {np.mean(diff > 1e-3) * 100:.1f}% of steps")
    for i in range(0, steps, max(1, steps // 5)):
        print(f"t={i * dt:5.1f}: pos=({float(xs[i, 0]):+.2f},{float(xs[i, 1]):+.2f}) "
              f"h={float(hs[i]):+.2f}")


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
