#!/usr/bin/env python
"""Headline benchmark: batched 50-stage double-integrator MPC QP solves/sec.

This is the driver north-star config (BASELINE.json): repeatedly solve the
K=50-node double-integrator tracking MPC QP (examples/mpc_doubleintegrator.cpp
problem) for a batch of independent controllers on one TPU chip, in the
realistic warmstarted closed-loop regime.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}
where vs_baseline is relative to the 10,000 solves/sec target.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from smooth_feedback_tpu.controllers import MPCParams, MPCWeights, make_mpc_step
    from smooth_feedback_tpu.groups import Rn
    from smooth_feedback_tpu.qp import QPSolverParams

    dtype = jnp.float32
    X, U = Rn(2), Rn(1)
    f = lambda x, u: jnp.stack([x[1], u[0]])
    xdes = lambda t: jnp.stack([-0.5 * jnp.sin(0.3 * t), -0.15 * jnp.cos(0.3 * t)])
    udes = lambda t: jnp.zeros(1, dtype)

    step, ws0 = make_mpc_step(
        X,
        U,
        f,
        xdes,
        udes,
        weights=MPCWeights(
            Q=jnp.eye(2, dtype=dtype),
            Qtf=0.1 * jnp.eye(2, dtype=dtype),
            R=0.1 * jnp.eye(1, dtype=dtype),
        ),
        params=MPCParams(
            K=50,
            tf=5.0,
            qp=QPSolverParams(
                scaling=True,
                polish=False,
                max_iter=100,
                stop_check_iter=10,  # checks are cheap GEMMs in the shared kernel
                backend="pallas",
            ),
        ),
        cr=lambda x, u: u,
        crl=jnp.array([-0.5], dtype),
        cru=jnp.array([0.5], dtype),
        dtype=dtype,
        reuse_factors=True,  # LTI problem: factorization is step-invariant
    )

    B = 1024
    key = jax.random.PRNGKey(0)
    xs = 0.5 * jax.random.normal(key, (B, 2), dtype)
    wss = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), ws0)

    fleet = jax.jit(step.fleet_shared_t)  # LTI fleet on a common clock
    res = fleet(wss, 0.0, xs)  # compile + cold solve
    jax.block_until_ready(res)
    res = fleet(res.warmstart, 0.0, xs)  # enter warmstarted regime
    jax.block_until_ready(res)

    nrep = 10
    t0 = time.perf_counter()
    for i in range(nrep):
        res = fleet(res.warmstart, 0.05 * i, xs)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / nrep

    st = np.asarray(res.status)
    value = B / dt
    out = {
        "metric": "di_mpc_k50_qp_solves_per_sec",
        "value": round(float(value), 1),
        "unit": "solves/sec",
        "vs_baseline": round(float(value) / 10000.0, 3),
    }
    print(json.dumps(out))
    print(
        f"# batch={B} step={dt * 1e3:.1f}ms optimal={np.mean(st == 0) * 100:.0f}% "
        f"device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
