#!/usr/bin/env python
"""ASIF safety filtering on the double integrator (port of the workload of
the reference example asif_doubleintegrator.cpp): keep position >= 0 while
the desired input pushes toward the unsafe region."""

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.controllers.asif import (
    ASIFilterParams,
    ASIFtoQPParams,
    make_asif_step,
)
from smooth_feedback_tpu.groups import Rn
from smooth_feedback_tpu.utils.bounds import ManifoldBounds


def main(steps: int = 500):
    X, U = Rn(2), Rn(1)  # (p, v)
    f = lambda x, u: jnp.stack([x[1], u[0]])
    h = lambda t, x: jnp.stack([x[0] + 0.5 * x[1]])  # lookahead barrier
    bu = lambda t, x: jnp.array([1.0])  # backup: full brake (accelerate up)

    step, ws0 = make_asif_step(
        X, U, f, h, bu,
        params=ASIFilterParams(
            T=3.0, asif=ASIFtoQPParams(K=30, alpha=2.0, dt=0.05)
        ),
        ulim=ManifoldBounds(
            A=jnp.eye(1), c=jnp.zeros(1), l=jnp.array([-1.0]), u=jnp.array([1.0])
        ),
    )

    dt = 0.02

    @jax.jit
    def rollout(x0, ws):
        def body(carry, i):
            x, ws = carry
            res = step(ws, x, jnp.array([-1.0]))
            x = x + dt * f(x, res.u)
            return (x, res.warmstart), (x, res.u)

        return jax.lax.scan(body, (x0, ws), jnp.arange(steps))

    (_, _), (xs, us) = rollout(jnp.array([2.0, 0.0]), ws0)
    xs = np.asarray(xs)
    print(f"min position: {xs[:, 0].min():+.4f} (safe iff >= ~0)")
    print(f"final state: p={xs[-1, 0]:+.3f} v={xs[-1, 1]:+.3f}")
    assert xs[:, 0].min() > -0.05


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
