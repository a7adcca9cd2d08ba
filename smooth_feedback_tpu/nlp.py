"""Nonlinear program types (L1 problem definitions).

Lives at the package top level so the NLP solvers (solvers/) and the OCP
transcription layer (ocp/) can both depend on it without a package cycle
(solvers.sqp <-> ocp.solve).

TPU-native analog of the reference nlp.hpp: an NLP

    min   f(x)
    s.t.  xl <= x <= xu
          gl <= g(x) <= gu

is a container of jax-traceable callables plus bound arrays.  Derivatives
(df_dx, dg_dx, Lagrangian Hessian) are NOT part of the interface — solvers
obtain them with jax autodiff (the reference's NLP concept requires explicit
derivative members, nlp.hpp:30-64, because C++ has no tracing autodiff).
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional

import jax


class NLP(NamedTuple):
    """cf. reference NLP concept (nlp.hpp:30-52)."""

    n: int  # number of variables
    m: int  # number of constraints
    f: Callable  # (n,) -> scalar           objective
    g: Callable  # (n,) -> (m,)             constraints
    xl: jax.Array  # (n,) variable lower bounds
    xu: jax.Array  # (n,) variable upper bounds
    gl: jax.Array  # (m,) constraint lower bounds
    gu: jax.Array  # (m,) constraint upper bounds


class HessianNLP(NamedTuple):
    """NLP with explicit second-order callables (cf. reference HessianNLP
    concept, nlp.hpp:57-64: ``d2f_dx2(x)`` and the multiplier-contracted
    ``d2g_dx2(x, lambda)``).

    The native SQP never needs this type — it differentiates ``NLP``
    callables with jax autodiff internally — but external solvers speak
    explicit-derivative interfaces (Ipopt's eval_h), so this is the surface
    the compat bridges consume for exact second-order mode.  Build one from
    a plain ``NLP`` with :func:`with_hessians`.
    """

    nlp: "NLP"
    d2f_dx2: Callable  # (n,) -> (n, n)
    d2g_dx2: Callable  # ((n,), (m,)) -> (n, n)   sum_i lam_i * H(g_i)(x)


def with_hessians(nlp: NLP) -> HessianNLP:
    """Fill a :class:`HessianNLP` from a plain :class:`NLP` by autodiff.

    ``d2g_dx2`` contracts the multipliers BEFORE differentiating (Hessian of
    ``lam . g``), so no (m, n, n) third-order tensor is ever materialized —
    the jax analog of the reference's sparse accumulation
    (ocp_to_nlp.hpp d2g_dx2 assembly).
    """
    import jax

    return HessianNLP(
        nlp=nlp,
        d2f_dx2=jax.hessian(nlp.f),
        d2g_dx2=jax.hessian(lambda x, lam: lam @ nlp.g(x), argnums=0),
    )


class NLPSolutionStatus(enum.IntEnum):
    """cf. reference NLPSolution::Status (nlp.hpp:71-82)."""

    Optimal = 0
    PrimalInfeasible = 1
    DualInfeasible = 2
    IterationLimit = 3
    Unknown = 4


class NLPSolution(NamedTuple):
    """cf. reference NLPSolution (nlp.hpp:69-100)."""

    status: jax.Array  # int32 NLPSolutionStatus
    iters: jax.Array  # int32
    x: jax.Array  # (n,) primal
    zl: jax.Array  # (n,) multipliers for xl
    zu: jax.Array  # (n,) multipliers for xu
    lam: jax.Array  # (m,) constraint multipliers
    objective: jax.Array  # scalar
    kkt_res: jax.Array  # scalar: final KKT residual (observability)
    # int32: total inner-QP ADMM iterations across the solve (native SQP
    # only; 0 from external bridges).  Observability for lockstep tuning:
    # vmapped sweeps pay the max of this across the fleet (docs/TUNING.md
    # "Tiny-QP fleets" / benchmarks/ocp_se2.py budget notes).
    qp_iters: jax.Array = 0
