#!/usr/bin/env python
"""SE(2) PID control of the Lie-group double integrator (port of the workload
of the reference example pid_se2.cpp): track a time-varying pose trajectory."""

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.controllers import PIDParams, pid_gains, pid_init, pid_step
from smooth_feedback_tpu.groups import SE2


def main(steps: int = 2000):
    twist = jnp.array([0.4, 0.0, 0.3])
    xdes = lambda t: SE2.exp(t * twist)
    gains = pid_gains(SE2, kp=2.0, kd=2.5, ki=0.2)
    prm = PIDParams(windup_limit=1.0)

    dt = 0.01

    @jax.jit
    def rollout(x0, v0):
        def body(carry, i):
            x, v, st = carry
            t = i * dt
            u, st = pid_step(
                SE2, prm, gains, st, t, x, v, xdes(t), twist, jnp.zeros(3)
            )
            v = v + dt * u
            x = SE2.rplus(x, dt * v)
            return (x, v, st), SE2.rminus(x, xdes(t + dt))

        return jax.lax.scan(body, (x0, v0, pid_init(SE2)), jnp.arange(steps))

    x0 = SE2.exp(jnp.array([1.0, -0.5, 0.8]))
    (_, _, _), errs = rollout(x0, jnp.zeros(3))
    errs = np.linalg.norm(np.asarray(errs), axis=1)
    print(f"initial error {errs[0]:.3f} -> final error {errs[-1]:.5f}")
    assert errs[-1] < (0.05 if steps >= 2000 else errs[0])


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
