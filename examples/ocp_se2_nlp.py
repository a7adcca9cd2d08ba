#!/usr/bin/env python
"""SE(2) optimal control with hp-adaptive mesh refinement.

Port of the workload of the reference example ocp_se2_nlp.cpp: flatten the
Lie-group OCP, transcribe on an LGR mesh, solve with the native SQP solver
(replacing Ipopt), estimate interval dynamics errors, refine, repeat until the
1e-6 error target is met.
"""

import time

import jax

jax.config.update("jax_enable_x64", True)  # accuracy demo: match the f64 reference
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.groups import SE2, Bundle, Rn
from smooth_feedback_tpu.ocp import (
    OCP,
    SolveOCPParams,
    flatten_ocp,
    solve_ocp_flat,
    unflatten_ocpsol,
)
from smooth_feedback_tpu.ocp.collocation import Mesh
from smooth_feedback_tpu.solvers import SQPParams

X = Bundle(SE2, Rn(2))  # pose + (v, w)
U = Rn(2)

vel = jnp.array([1.0, 0.0, 0.5])


def xdes(t):
    return jnp.concatenate([SE2.exp(t * vel), jnp.stack([vel[0], vel[2]])])


def make_ocp():
    """examples/ocp_se2.hpp: min tf + integral tracking cost, |u| <= 1,
    tf = 5 and x0 fixed via end constraints."""

    def f(t, x, u):
        return jnp.stack([x[4], jnp.zeros(()), x[5], u[0], u[1]])

    def g(t, x, u):
        e = X.rminus(x, xdes(t))
        return jnp.array([0.5 * (e @ e + u @ u)])

    return OCP(
        X=X, U=U,
        theta=lambda tf, x0, xf, q: tf + q[0],
        f=f, g=g,
        cr=lambda t, x, u: u,
        crl=jnp.array([-1.0, -1.0]), cru=jnp.array([1.0, 1.0]),
        ce=lambda tf, x0, xf, q: jnp.concatenate([tf[None], X.log(x0)]),
        cel=jnp.array([5.0, 0.0, 0.0, 0.0, 1.0, 0.0]),
        ceu=jnp.array([5.0, 0.0, 0.0, 0.0, 1.0, 0.0]),
    )


def main(target_err: float = 1e-6, max_refine_iter: int = 10):
    ocp = make_ocp()
    xl = lambda t: X.identity()
    ul = lambda t: jnp.full(2, 0.01)
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
        print(f"t={t:4.1f}: pos=({float(x[0]):+.2f},{float(x[1]):+.2f}) "
              f"u=({float(u[0]):+.2f},{float(u[1]):+.2f})")


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
