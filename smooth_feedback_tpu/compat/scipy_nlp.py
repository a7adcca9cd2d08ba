"""Host-side NLP oracle via scipy (stand-in for the reference's Ipopt bridge,
compat/ipopt.hpp).  Not jit-compatible: runs on the host for validation."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..nlp import NLP, NLPSolution, NLPSolutionStatus


def solve_nlp_scipy(nlp: NLP, x0, maxiter: int = 500, tol: float = 1e-9) -> NLPSolution:
    """Solve with scipy trust-constr using jax-provided derivatives."""
    from scipy.optimize import Bounds, NonlinearConstraint, minimize

    f = jax.jit(nlp.f)
    grad = jax.jit(jax.grad(nlp.f))
    g = jax.jit(nlp.g)
    jac = jax.jit(jax.jacrev(nlp.g))

    res = minimize(
        lambda x: float(f(jnp.asarray(x))),
        np.asarray(x0, np.float64),
        jac=lambda x: np.asarray(grad(jnp.asarray(x))),
        method="trust-constr",
        bounds=Bounds(np.asarray(nlp.xl), np.asarray(nlp.xu)),
        constraints=[
            NonlinearConstraint(
                lambda x: np.asarray(g(jnp.asarray(x))),
                np.asarray(nlp.gl),
                np.asarray(nlp.gu),
                jac=lambda x: np.asarray(jac(jnp.asarray(x))),
            )
        ],
        options={"maxiter": maxiter, "gtol": tol, "xtol": 1e-12},
    )

    lam = np.zeros(nlp.m)
    if res.v:  # list of multiplier arrays per constraint block
        lam = -np.asarray(res.v[0])
    status = (
        NLPSolutionStatus.Optimal
        if res.status in (1, 2)
        else NLPSolutionStatus.IterationLimit
    )
    return NLPSolution(
        status=jnp.asarray(int(status), jnp.int32),
        iters=jnp.asarray(res.nit, jnp.int32),
        x=jnp.asarray(res.x),
        zl=jnp.zeros(nlp.n),
        zu=jnp.zeros(nlp.n),
        lam=jnp.asarray(lam),
        objective=jnp.asarray(res.fun),
        kkt_res=jnp.asarray(res.optimality),
        qp_iters=jnp.asarray(0, jnp.int32),
    )
