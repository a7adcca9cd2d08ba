#!/usr/bin/env python
"""SE(2) OCP solved as one QP via Lie-group linearization (port of the
workload of the reference example ocp_se2_qp.cpp, K=50): the transcription
linearizes around a screw nominal with the non-commutative ad-correction."""

import time

import jax

jax.config.update("jax_enable_x64", True)  # accuracy demo: match the f64 reference
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.groups import SE2, Bundle, Rn
from smooth_feedback_tpu.ocp import OCP, ocp_to_qp, qpsol_to_ocpsol
from smooth_feedback_tpu.ocp.collocation import Mesh
from smooth_feedback_tpu.qp import QPSolverParams, solve_qp

X = Bundle(SE2, Rn(2))
U = Rn(2)
vel = jnp.array([1.0, 0.0, 0.5])


def xdes(t):
    return jnp.concatenate([SE2.exp(t * vel), jnp.stack([vel[0], vel[2]])])


def main(n_ival: int = 10):
    def f(t, x, u):
        return jnp.stack([x[4], jnp.zeros(()), x[5], u[0], u[1]])

    def g(t, x, u):
        e = X.rminus(x, xdes(t))
        return jnp.array([0.5 * (e @ e + u @ u)])

    ocp = OCP(
        X=X, U=U,
        theta=lambda tf, x0, xf, q: q[0],
        f=f, g=g,
        cr=lambda t, x, u: u,
        crl=jnp.array([-1.0, -1.0]),
        cru=jnp.array([1.0, 1.0]),
        ce=lambda tf, x0, xf, q: X.log(x0),
        cel=jnp.array([0.0, 0.0, 0.0, 1.0, 0.0]),
        ceu=jnp.array([0.0, 0.0, 0.0, 1.0, 0.0]),
    )

    mesh = Mesh.uniform(n_ival, 5, Kmin=5, Kmax=5)  # 5*n_ival colloc points
    tf = 5.0
    # linearize around the desired screw trajectory (feasible nominal)
    xl = xdes
    ul = lambda t: jnp.zeros(2)
    dxl = lambda t: jnp.concatenate([vel, jnp.zeros(2)])

    build = jax.jit(lambda: ocp_to_qp(ocp, mesh, tf, xl, ul, dxl))
    qp = build()
    jax.block_until_ready(qp)

    t0 = time.perf_counter()
    qp = build()
    jax.block_until_ready(qp)
    t1 = time.perf_counter()
    sol = solve_qp(qp, QPSolverParams(eps_abs=1e-6, eps_rel=1e-6, max_iter=20000))
    jax.block_until_ready(sol)
    t2 = time.perf_counter()
    print(f"transcription: {(t1 - t0) * 1e6:.0f}us, solve: {(t2 - t1) * 1e6:.0f}us, "
          f"status {int(sol.status)}, iters {int(sol.iters)}")

    osol = qpsol_to_ocpsol(ocp, mesh, sol, tf, xl, ul)
    # the nominal already satisfies dynamics and initial conditions; the QP
    # deviation should be small
    dev = float(jnp.linalg.norm(sol.primal))
    print(f"deviation norm from nominal: {dev:.4f}")
    for t in np.linspace(0, tf, 6):
        x = osol.x(jnp.asarray(t))
        print(f"t={t:4.1f}: pos=({float(x[0]):+.3f},{float(x[1]):+.3f}) "
              f"v=({float(x[4]):+.3f},{float(x[5]):+.3f})")


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
