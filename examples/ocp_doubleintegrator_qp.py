#!/usr/bin/env python
"""Double-integrator OCP solved directly as one QP (port of the workload of
the reference example ocp_doubleintegrator_qp.cpp, K=40): transcribe with
ocp_to_qp around a zero nominal and solve with the batched ADMM kernel."""

import time

import jax

jax.config.update("jax_enable_x64", True)  # accuracy demo: match the f64 reference
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.groups import Rn
from smooth_feedback_tpu.ocp import OCP, ocp_to_qp, qpsol_to_ocpsol, variable_layout
from smooth_feedback_tpu.ocp.collocation import Mesh
from smooth_feedback_tpu.qp import QPSolverParams, solve_qp


def main(n_ival: int = 10):
    X, U = Rn(2), Rn(1)
    ocp = OCP(
        X=X, U=U,
        theta=lambda tf, x0, xf, q: q[0] + 0.05 * (xf @ xf),
        f=lambda t, x, u: jnp.stack([x[1], u[0]]),
        g=lambda t, x, u: jnp.array([0.5 * (x @ x) + 0.05 * (u @ u)]),
        cr=lambda t, x, u: u,
        crl=jnp.array([-1.0]),
        cru=jnp.array([1.0]),
        ce=lambda tf, x0, xf, q: x0,
        cel=jnp.array([1.0, 0.0]),
        ceu=jnp.array([1.0, 0.0]),
    )
    mesh = Mesh.uniform(n_ival, 4, Kmin=4, Kmax=4)  # K = 4*n_ival colloc points
    tf = 5.0
    xl = lambda t: jnp.zeros(2)
    ul = lambda t: jnp.zeros(1)

    build = jax.jit(lambda: ocp_to_qp(ocp, mesh, tf, xl, ul))
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
    for t in np.linspace(0, tf, 11):
        x = osol.x(jnp.asarray(t))
        print(f"t={t:4.1f}: p={float(x[0]):+.4f} v={float(x[1]):+.4f}")


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
