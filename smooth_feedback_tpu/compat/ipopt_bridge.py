"""Bridge to Ipopt via cyipopt (cf. reference compat/ipopt.hpp).

Activates only when ``cyipopt`` is installed (not in this image; the native
SQP solver in ``smooth_feedback_tpu.solvers`` and the scipy bridge cover its
role).  Derivatives are supplied to Ipopt from jax autodiff.
"""

from __future__ import annotations

import numpy as np

from ..nlp import NLP, HessianNLP, NLPSolution, NLPSolutionStatus


def ipopt_available() -> bool:
    try:
        import cyipopt  # noqa: F401

        return True
    except ImportError:
        return False


def solve_nlp_ipopt(
    nlp: NLP | HessianNLP,
    x0,
    options: dict | None = None,
    warmstart: NLPSolution | None = None,
) -> NLPSolution:
    """Solve an NLP with Ipopt and jax-provided derivatives.

    Passing a plain :class:`NLP` uses first derivatives + Ipopt's L-BFGS
    Hessian (the reference example configuration, ocp_se2_nlp.cpp:60-66).
    Passing a :class:`HessianNLP` (see :func:`smooth_feedback_tpu.nlp.with_hessians`)
    additionally registers the exact Lagrangian Hessian
    ``obj_factor * d2f_dx2(x) + d2g_dx2(x, lam)`` — the reference's
    HessianNLP -> Ipopt eval_h path (compat/ipopt.hpp:206-213), dense
    lower-triangle structure.

    ``warmstart`` (e.g. a previous mesh's solution through
    ``ocpsol_to_nlpsol``) re-enters Ipopt with the full primal-dual point —
    the reference's ``get_starting_point`` path (compat/ipopt.hpp:95-116):
    primal from ``warmstart.x`` (overrides ``x0``), bound multipliers
    ``zl``/``zu``, and constraint multipliers ``lam`` (sign-flipped to
    Ipopt's ``mult_g`` convention), with ``warm_start_init_point`` set.
    Iteration counts are recorded through Ipopt's intermediate callback
    (cyipopt exposes no count in the result info).
    """
    import cyipopt
    import jax
    import jax.numpy as jnp

    hess_nlp = nlp if isinstance(nlp, HessianNLP) else None
    if hess_nlp is not None:
        nlp = hess_nlp.nlp

    f = jax.jit(nlp.f)
    grad = jax.jit(jax.grad(nlp.f))
    g = jax.jit(nlp.g)
    jac = jax.jit(jax.jacrev(nlp.g))
    iter_count = [0]

    class _Problem:
        def objective(self, x):
            return float(f(jnp.asarray(x)))

        def gradient(self, x):
            return np.asarray(grad(jnp.asarray(x)))

        def constraints(self, x):
            return np.asarray(g(jnp.asarray(x)))

        def jacobian(self, x):
            return np.asarray(jac(jnp.asarray(x))).ravel()

        def intermediate(self, alg_mod, it, *args, **kwargs):
            # Ipopt's per-iteration callback: the only channel cyipopt
            # exposes the iteration count through (the result info dict
            # carries none)
            iter_count[0] = int(it)
            return True

    if hess_nlp is not None:
        hf = jax.jit(hess_nlp.d2f_dx2)
        hg = jax.jit(hess_nlp.d2g_dx2)
        tril = np.tril_indices(nlp.n)

        class _HessianProblem(_Problem):
            def hessianstructure(self):
                return tril

            def hessian(self, x, lam, obj_factor):
                x = jnp.asarray(x)
                H = obj_factor * hf(x) + hg(x, jnp.asarray(lam))
                return np.asarray(H)[tril]

        problem_obj = _HessianProblem()
    else:
        problem_obj = _Problem()

    problem = cyipopt.Problem(
        n=nlp.n,
        m=nlp.m,
        problem_obj=problem_obj,
        lb=np.clip(np.asarray(nlp.xl), -2e19, 2e19),
        ub=np.clip(np.asarray(nlp.xu), -2e19, 2e19),
        cl=np.clip(np.asarray(nlp.gl), -2e19, 2e19),
        cu=np.clip(np.asarray(nlp.gu), -2e19, 2e19),
    )
    if hess_nlp is None:
        problem.add_option("hessian_approximation", "limited-memory")
    if warmstart is not None:
        problem.add_option("warm_start_init_point", "yes")
    for k, v in (options or {}).items():
        problem.add_option(k, v)

    if warmstart is not None:
        # full primal-dual restart (compat/ipopt.hpp:95-116): lam -> mult_g
        # with the sign flip this bridge inverts on the way back out
        x, info = problem.solve(
            np.asarray(warmstart.x, np.float64),
            lagrange=(-np.asarray(warmstart.lam, np.float64)).tolist(),
            zl=np.asarray(warmstart.zl, np.float64).tolist(),
            zu=np.asarray(warmstart.zu, np.float64).tolist(),
        )
    else:
        x, info = problem.solve(np.asarray(x0, np.float64))

    # reference status mapping, compat/ipopt.hpp:246-268
    status = {
        0: NLPSolutionStatus.Optimal,  # Solve_Succeeded
        1: NLPSolutionStatus.Optimal,  # Solved_To_Acceptable_Level
        2: NLPSolutionStatus.PrimalInfeasible,  # Infeasible_Problem_Detected
        4: NLPSolutionStatus.DualInfeasible,  # Diverging_Iterates
        -1: NLPSolutionStatus.IterationLimit,  # Maximum_Iterations_Exceeded
        -4: NLPSolutionStatus.IterationLimit,  # Maximum_CpuTime_Exceeded
    }.get(info["status"], NLPSolutionStatus.Unknown)
    return NLPSolution(
        status=np.int32(int(status)),
        iters=np.int32(iter_count[0]),
        x=np.asarray(x),
        zl=np.asarray(info["mult_x_L"]),
        zu=np.asarray(info["mult_x_U"]),
        lam=-np.asarray(info["mult_g"]),
        objective=np.float64(info["obj_val"]),
        kkt_res=np.float64(0.0),
        qp_iters=np.int32(0),
    )
