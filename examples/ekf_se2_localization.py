#!/usr/bin/env python
"""SE(2) EKF localization: predict through unicycle dynamics, update from
landmark bearings-range measurements (the workload behind BASELINE config 3)."""

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.estimators import ekf_predict, ekf_reset, ekf_update
from smooth_feedback_tpu.groups import SE2


def main(steps: int = 200):
    key = jax.random.PRNGKey(0)
    landmarks = jnp.array([[3.0, 1.0], [-2.0, 4.0], [1.0, -3.0], [4.0, -1.0]])

    def meas(g):
        inv = SE2.inverse(g)
        R = jnp.array([[inv[2], -inv[3]], [inv[3], inv[2]]])
        return (landmarks @ R.T + inv[:2]).ravel()

    twist = jnp.array([1.0, 0.0, 0.4])
    dyn = lambda t, g: twist

    dt = 0.1
    Q = 0.01 * jnp.eye(3)
    R_meas = 0.001 * jnp.eye(8)

    true_pose = SE2.identity()
    state = ekf_reset(SE2, SE2.exp(jnp.array([0.5, -0.5, 0.3])), jnp.eye(3))

    @jax.jit
    def loop(state, true_pose, key):
        def body(carry, i):
            st, tp, k = carry
            k, kn = jax.random.split(k)
            tp = SE2.rplus(tp, dt * twist)
            st = ekf_predict(SE2, dyn, st, Q, dt, n_steps=1)
            y = meas(tp) + 0.03 * jax.random.normal(kn, (8,))
            st = ekf_update(SE2, meas, st, y, R_meas)
            err = SE2.rminus(st.g, tp)
            return (st, tp, k), jnp.linalg.norm(err)

        return jax.lax.scan(body, (state, true_pose, key), jnp.arange(steps))

    (state, true_pose, _), errs = loop(state, true_pose, key)
    errs = np.asarray(errs)
    print(f"pose error: initial {errs[0]:.3f} -> final {errs[-1]:.4f}")
    print(f"final covariance trace: {float(jnp.trace(state.P)):.5f}")
    assert errs[-1] < (0.1 if steps >= 200 else errs[0])


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
