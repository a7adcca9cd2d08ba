#!/usr/bin/env python
"""SE(3) rigid-body hover: MPC on X = SE(3) x R^6 (pose + body twist).

The 3D analog of the reference's vehicle examples: a fully-actuated rigid
body (gravity pre-compensated wrench input, double-integrator attitude +
position dynamics in the body frame) is driven from an offset pose and
nonzero twist back to hover at a fixed target pose.  Exercises the
transcription / flatten machinery on SE(3) — closed-form dr_expinv and the
non-commutative ad-correction (ocp_to_qp.hpp:262-264 in the reference) in
all six degrees of freedom.
"""

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.controllers import MPCParams, MPCWeights, make_mpc_step
from smooth_feedback_tpu.groups import SE3, Bundle, Rn
from smooth_feedback_tpu.qp import QPSolverParams

X = Bundle(SE3, Rn(6))  # pose + body twist (v, w)
U = Rn(6)  # body wrench (gravity pre-compensated)


def f(x, u):
    """d^r x = [twist; u]: kinematics driven by the body twist, unit-inertia
    wrench-to-acceleration (pre-compensated gravity)."""
    v = x[7:]
    return jnp.concatenate([v, u])


def main(steps: int = 300):
    target = SE3.exp(jnp.array([1.0, -0.5, 0.8, 0.0, 0.0, 0.6]))
    xdes = lambda t: jnp.concatenate([target, jnp.zeros(6)])
    dxdes = lambda t: jnp.zeros(12)
    udes = lambda t: jnp.zeros(6)

    step, ws0 = make_mpc_step(
        X, U, f, xdes, udes, dxdes=dxdes,
        weights=MPCWeights(
            Q=jnp.eye(12), Qtf=5.0 * jnp.eye(12), R=0.1 * jnp.eye(6)
        ),
        params=MPCParams(K=8, tf=2.0, qp=QPSolverParams(polish=False)),
        cr=lambda x, u: u,
        crl=-2.0 * jnp.ones(6),
        cru=2.0 * jnp.ones(6),
    )

    dt = 0.05

    @jax.jit
    def rollout(x0, ws):
        def body(carry, i):
            x, ws = carry
            res = step(ws, i * dt, x)
            x = X.rplus(x, dt * f(x, res.u))
            err = X.rminus(x, xdes(i * dt))
            return (x, res.warmstart), (res.status, jnp.linalg.norm(err))

        return jax.lax.scan(body, (x0, ws), jnp.arange(steps))

    # start away from the hover target, tumbling
    x0 = X.rplus(
        X.identity(),
        jnp.concatenate([jnp.zeros(6), jnp.array([0.3, -0.2, 0.1, 0.1, 0.2, -0.1])]),
    )
    (xf, _), (statuses, errs) = rollout(x0, ws0)
    errs = np.asarray(errs)
    print(f"hover error: initial {errs[0]:.3f} -> final {errs[-1]:.4f} "
          f"({steps} steps, optimal {np.mean(np.asarray(statuses) == 0) * 100:.1f}%)")
    for i in range(0, steps, max(1, steps // 6)):
        print(f"t={i * dt:5.2f}: |err|={errs[i]:.4f}")
    assert np.all(np.asarray(statuses) == 0)
    if steps >= 300:
        assert errs[-1] < 1e-2, f"did not reach hover: {errs[-1]}"
    else:
        assert errs[-1] < errs[0]


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
