#!/usr/bin/env python
"""Double-integrator OCP as a nonlinear program with hp-adaptive refinement.

Port of the workload of the reference example ocp_doubleintegrator_nlp.cpp
(problem fixture ocp_doubleintegrator.hpp): minimise the integral of
|x|^2 + |u|^2 subject to velocity/input bounds and fixed endpoints, solve
through flatten -> LGR collocation -> native SQP (replacing Ipopt), refine
the mesh on the dynamics-error estimate until the 1e-6 target is met.
Like the reference, it first runs the OCP derivative self-check.
"""

import time

import jax

jax.config.update("jax_enable_x64", True)  # accuracy demo: match the f64 reference
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.groups import Rn
from smooth_feedback_tpu.ocp import (
    OCP,
    SolveOCPParams,
    flatten_ocp,
    solve_ocp_flat,
    test_ocp_derivatives,
    unflatten_ocpsol,
)
from smooth_feedback_tpu.ocp.collocation import Mesh
from smooth_feedback_tpu.solvers import SQPParams


def make_ocp():
    """ocp_doubleintegrator.hpp: min integral(|x|^2+|u|^2), dynamics
    [pos' = vel, vel' = u], vel in [-0.5, 1.5], u in [-1, 1],
    tf = 5 fixed, x0 = (1, 1), xf = (0.1, 0) fixed via end constraints."""
    return OCP(
        X=Rn(2), U=Rn(1),
        theta=lambda tf, x0, xf, q: q[0],
        f=lambda t, x, u: jnp.stack([x[1], u[0]]),
        g=lambda t, x, u: jnp.array([x @ x + u @ u]),
        cr=lambda t, x, u: jnp.stack([x[1], u[0]]),
        crl=jnp.array([-0.5, -1.0]),
        cru=jnp.array([1.5, 1.0]),
        ce=lambda tf, x0, xf, q: jnp.concatenate([tf[None], x0, xf]),
        cel=jnp.array([5.0, 1.0, 1.0, 0.1, 0.0]),
        ceu=jnp.array([5.0, 1.0, 1.0, 0.1, 0.0]),
    )


def main(target_err: float = 1e-6, max_refine_iter: int = 10):
    ocp = make_ocp()
    # the reference example's first statement (ocp_doubleintegrator_nlp.cpp:26)
    test_ocp_derivatives(ocp, jax.random.PRNGKey(0), num=2)

    xl = lambda t: jnp.zeros(2)
    ul = lambda t: jnp.zeros(1)
    flat = flatten_ocp(ocp, xl, ul)

    t0 = time.perf_counter()
    flatsol, mesh, info = solve_ocp_flat(
        flat,
        Mesh(),
        SolveOCPParams(
            target_err=target_err,
            max_refine_iter=max_refine_iter,
            tf_guess=5.0,
            sqp=SQPParams(max_iter=200, tol=1e-8),
            verbose=True,
        ),
    )
    print(f"TOTAL TIME: {time.perf_counter() - t0:.1f}s")
    print(f"status: {info.status.name}, final mesh: {mesh.N_ivals} intervals / "
          f"{mesh.N_colloc} points, dyn errors per iteration: "
          + " ".join(f"{e:.1e}" for e in info.errors))

    sol = unflatten_ocpsol(flatsol, ocp, xl, ul)
    for t in np.linspace(0, float(sol.tf), 11):
        x = sol.x(jnp.asarray(t))
        u = sol.u(jnp.asarray(t))
        print(f"t={t:4.1f}: pos={float(x[0]):+.3f} vel={float(x[1]):+.3f} "
              f"u={float(u[0]):+.3f}")


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
