#!/usr/bin/env python
"""SE(3)xR^3 rigid-body optimal control: a FLEET of screw-reach problems
solved by the natively batched SQP on a shared hp-refined mesh.

The 3-D counterpart of ocp_se2_nlp.py (reference workload:
examples/ocp_se2_nlp.cpp generalized to SE(3), exercising the closed-form
SE(3) second-order right Jacobians of ocp_flatten.hpp:58-81 through
flatten_ocp): each fleet member tracks a different screw trajectory with a
velocity/acceleration-controlled rigid body, the whole fleet solves as ONE
compiled batched SQP per mesh signature (`solve_ocp_flat_batch`), and the
mesh refines on the fleet-max interval dynamics error.
"""

import time

import jax

jax.config.update("jax_enable_x64", True)  # accuracy demo: match f64 reference
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.groups import SE3, Bundle, Rn
from smooth_feedback_tpu.ocp import (
    OCP,
    SolveOCPParams,
    flatten_ocp,
    nlpsol_to_ocpsol,
    solve_ocp_flat_batch,
)
from smooth_feedback_tpu.ocp.collocation import Mesh
from smooth_feedback_tpu.solvers import SQPParams

X = Bundle(SE3, Rn(3))  # pose (7) + body linear velocity (3)
U = Rn(6)  # [linear acceleration (3), body angular velocity (3)]

TF = 3.0


def make_flat(twist):
    """Flat OCP for one tracked screw (traceable in ``twist``)."""

    def xdes(t):
        return jnp.concatenate([SE3.exp(t * twist), twist[:3]])

    def f(t, x, u):
        # d(pose) = [v_body, w], d(v) = a
        return jnp.concatenate([x[7:10], u[3:6], u[0:3]])

    def g(t, x, u):
        e = X.rminus(x, xdes(t))
        return jnp.array([0.5 * (e @ e + 0.1 * u @ u)])

    ce_val = jnp.concatenate([jnp.array([TF]), jnp.zeros(6), twist[:3]])
    ocp = OCP(
        X=X, U=U,
        theta=lambda tf, x0, xf, q: q[0],
        f=f, g=g,
        cr=lambda t, x, u: u,
        crl=-2.0 * jnp.ones(6), cru=2.0 * jnp.ones(6),
        ce=lambda tf, x0, xf, q: jnp.concatenate([tf[None], X.log(x0)]),
        cel=ce_val, ceu=ce_val,
    )
    return flatten_ocp(ocp, lambda t: X.identity(), lambda t: jnp.full(6, 0.01))


def _fleet_twists(B):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    base = jnp.array([0.5, 0.0, 0.1, 0.0, 0.0, 0.3])
    dv = 0.1 * jax.random.normal(k1, (B, 3))
    dw = 0.05 * jax.random.normal(k2, (B, 3))
    return base[None, :] + jnp.concatenate([dv, dw], axis=1)


def main(target_err: float = 1e-4, max_refine_iter: int = 6, B: int = 8):
    twists = _fleet_twists(B)
    params = SolveOCPParams(
        target_err=target_err,
        max_refine_iter=max_refine_iter,
        tf_guess=TF,
        sqp=SQPParams(max_iter=150, tol=1e-7),
        verbose=True,
    )
    t0 = time.perf_counter()
    nlpsol, mesh, info = solve_ocp_flat_batch(make_flat, twists, Mesh(), params)
    print(f"TOTAL TIME: {time.perf_counter() - t0:.1f}s")
    st = np.asarray(info.statuses)
    print(
        f"fleet of {B}: {int((st == 0).sum())}/{B} Optimal, final mesh "
        f"{mesh.N_ivals} intervals / {mesh.N_colloc} points, dyn errors: "
        + " ".join(f"{e:.1e}" for e in info.errors)
    )

    # reconstruct member 0 and print its trajectory
    sol0 = nlpsol_to_ocpsol(
        make_flat(twists[0]), mesh, jax.tree.map(lambda a: a[0], nlpsol)
    )
    for t in np.linspace(0.0, float(sol0.tf), 7):
        x = sol0.x(jnp.asarray(t))
        print(
            f"t={t:4.1f}: pos=({float(x[0]):+.2f},{float(x[1]):+.2f},"
            f"{float(x[2]):+.2f}) |v|={float(jnp.linalg.norm(x[7:])):.2f}"
        )
    assert np.all(st == 0), "non-Optimal members in the fleet"


if __name__ == "__main__":
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # examples are compile-heavy; cache across runs
    main()
