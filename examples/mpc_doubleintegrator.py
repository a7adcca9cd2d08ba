#!/usr/bin/env python
"""Closed-loop double-integrator MPC tracking a sinusoid.

Port of the workload of the reference example mpc_doubleintegrator.cpp
(K=20, tf=5, 50 ms steps, Q=I, Qtf=0.1 I, R=0.1, |u| <= 0.5), with the whole
closed loop — controller AND plant — inside one jax.lax.scan, plus a batched
fleet variant.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.controllers import MPCParams, MPCWeights, make_mpc_step
from smooth_feedback_tpu.groups import Rn
from smooth_feedback_tpu.qp import QPSolverParams


def main(steps: int = 1200):
    X, U = Rn(2), Rn(1)
    f = lambda x, u: jnp.stack([x[1], u[0]])
    xdes = lambda t: jnp.stack([-0.5 * jnp.sin(0.3 * t), -0.15 * jnp.cos(0.3 * t)])
    udes = lambda t: jnp.zeros(1)

    step, ws0 = make_mpc_step(
        X, U, f, xdes, udes,
        weights=MPCWeights(Q=jnp.eye(2), Qtf=0.1 * jnp.eye(2), R=0.1 * jnp.eye(1)),
        params=MPCParams(K=20, tf=5.0, qp=QPSolverParams(polish=False, max_iter=300)),
        cr=lambda x, u: u,
        crl=jnp.array([-0.5]),
        cru=jnp.array([0.5]),
        reuse_factors=True,  # LTI problem: factorize once
        condense=True,  # and eliminate the states against the template
    )

    dt = 0.05

    def rk4(x, u):
        k1 = f(x, u)
        k2 = f(x + 0.5 * dt * k1, u)
        k3 = f(x + 0.5 * dt * k2, u)
        k4 = f(x + dt * k3, u)
        return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)

    @jax.jit
    def rollout(x0, ws):
        def body(carry, i):
            x, ws = carry
            res = step(ws, i * dt, x)
            x = rk4(x, res.u)
            return (x, res.warmstart), (x, res.u, res.status)

        return jax.lax.scan(body, (x0, ws), jnp.arange(steps))

    x0 = jnp.array([1.0, 0.0])
    t0 = time.perf_counter()
    (_, _), (xs, us, statuses) = rollout(x0, ws0)
    jax.block_until_ready(xs)
    wall = time.perf_counter() - t0

    ts = (np.arange(steps) + 1) * dt
    err = np.abs(np.asarray(xs)[:, 0] + 0.5 * np.sin(0.3 * ts))
    transient = min(200, steps // 2)
    print(f"MPC loop time: {wall * 1e6:.0f}us for {steps} steps "
          f"({wall / steps * 1e6:.0f}us/step incl. compile)")
    print(f"optimal: {np.mean(np.asarray(statuses) == 0) * 100:.1f}%")
    print(f"tracking err (after transient): max {err[transient:].max():.4f}")
    for i in range(0, steps, max(1, steps // 6)):
        print(f"t={ts[i]:5.1f}: x={float(xs[i, 0]):+.3f} v={float(xs[i, 1]):+.3f} "
              f"u={float(us[i, 0]):+.3f}")
    assert np.mean(np.asarray(statuses) == 0) > 0.95


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
