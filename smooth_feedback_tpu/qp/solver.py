"""Batched ADMM QP solver (operator splitting, OSQP-style).

TPU-native re-design of the reference's embedded solver (qp_solver.hpp): the
same operator-splitting algorithm [Stellato et al., "OSQP: an operator
splitting solver for quadratic programs", Math. Prog. Comp. 12, 2020], built
for throughput on accelerators:

* **Dense, fixed-shape, batch-first.** Every array carries a leading batch
  axis; thousands of small QPs solve in one XLA program.  The reference's
  sparse LDLT of the quasi-definite KKT matrix (qp_solver.hpp:423-429) is
  replaced by a Cholesky factorization of the positive-definite reduced matrix
  ``P_s + sigma I + A_s' diag(rho) A_s`` — algebraically the same KKT solve,
  but maps onto batched MXU matmuls and triangular solves.
* **Global iteration control.** A single scalar `lax.while_loop` drives the
  whole batch; converged elements freeze (mask-and-continue) while others
  iterate.  The periodic stopping check (every ``stop_check_iter`` iterations,
  qp_solver.hpp:465-509) stays a *real* branch because its predicate is the
  scalar global iteration counter — no per-element `select` waste.
* **Polish as a masked full-size solve.** Active-set polishing
  (qp_solver.hpp:93-204) is data-dependent in the reference; here the reduced
  KKT system is embedded in a fixed-shape (n+m) system where inactive
  multiplier rows are decoupled, keeping shapes static under jit.

Semantics parity with the reference (same parameter meanings and defaults,
same per-row rho selection, modified-Ruiz scaling, unscaled-residual stopping
criteria, primal/dual infeasibility certificates, warmstart scaling).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from .types import (
    QPSolution,
    QPSolutionStatus,
    QPSolverParams,
    QuadraticProgram,
)
from ..utils.compensated import cdot, cmatvec, two_sum
from ..utils.linalg import chol_lane, chol_solve_lane, mv_lane

_RUNNING = int(QPSolutionStatus.Running)
_OPTIMAL = int(QPSolutionStatus.Optimal)
_PRIMAL_INF = int(QPSolutionStatus.PrimalInfeasible)
_DUAL_INF = int(QPSolutionStatus.DualInfeasible)
_MAX_ITER = int(QPSolutionStatus.MaxIterations)
_POLISH_FAILED = int(QPSolutionStatus.PolishFailed)
_UNKNOWN = int(QPSolutionStatus.Unknown)


def _norm_inf(x, axis=-1):
    return jnp.max(jnp.abs(x), axis=axis)


# ------------------------------------------------------------------- scaling


def _ruiz(P, q, A, max_ruiz_iter: int = 10):
    """Modified-Ruiz equilibration of one QP; cf. qp_solver.hpp:673-730.

    Returns ``(c, sx, sy)`` such that the scaled problem is
    ``P_s = c Sx P Sx``, ``q_s = c Sx q``, ``A_s = Sy A Sx``.
    """
    dt = P.dtype
    n = P.shape[0]
    m = A.shape[0]

    colnorm_P = _norm_inf(P, axis=0)
    colnorm_P = jnp.where(colnorm_P == 0, 1.0, colnorm_P)
    c = 1.0 / jnp.maximum(
        jnp.asarray(1e-6, dt), jnp.maximum(jnp.mean(colnorm_P), _norm_inf(q))
    )

    def body(carry):
        sx, sy, it, _ = carry
        Pn = jnp.abs(c * sx[:, None] * sx[None, :] * P)
        An = jnp.abs(sy[:, None] * A * sx[None, :])
        sx_inc = jnp.maximum(jnp.max(Pn, axis=0), jnp.max(An, axis=0))
        sy_inc = jnp.max(An, axis=1)
        sx_inc = jnp.where(sx_inc == 0, 1.0, sx_inc)
        sy_inc = jnp.where(sy_inc == 0, 1.0, sy_inc)
        err = jnp.maximum(
            jnp.max(jnp.abs(sx_inc - 1.0)), jnp.max(jnp.abs(sy_inc - 1.0))
        )
        sx = sx * jax.lax.rsqrt(jnp.maximum(sx_inc, 1e-8))
        sy = sy * jax.lax.rsqrt(jnp.maximum(sy_inc, 1e-8))
        return sx, sy, it + 1, err

    def cond(carry):
        _, _, it, err = carry
        return jnp.logical_or(it == 0, jnp.logical_and(it <= max_ruiz_iter, err > 0.1))

    sx0 = jnp.ones((n,), dt)
    sy0 = jnp.ones((m,), dt)
    sx, sy, _, _ = lax.while_loop(cond, body, (sx0, sy0, jnp.int32(0), jnp.asarray(jnp.inf, dt)))
    return c, sx, sy


# ------------------------------------------------------------ stopping check


def _stopping_check(prm, P, q, A, l, u, x_us, y_us, z_us, dx_us, dy_us):
    """Per-element convergence / infeasibility certificates on UNSCALED data;
    cf. qp_solver.hpp:574-644.  All inputs carry a leading batch axis."""
    dt = P.dtype
    eps_abs = jnp.asarray(prm.eps_abs, dt)
    eps_rel = jnp.asarray(prm.eps_rel, dt)
    eps_pinf = jnp.asarray(prm.eps_primal_inf, dt)
    eps_dinf = jnp.asarray(prm.eps_dual_inf, dt)

    # --- divergence: non-finite iterates can never satisfy any criterion and
    # would otherwise run silently to the iteration cap (NaN compares False)
    diverged = jnp.logical_not(
        jnp.logical_and(
            jnp.isfinite(x_us).all(axis=1), jnp.isfinite(y_us).all(axis=1)
        )
    )

    # --- optimality
    if prm.compensated_check:
        # two-float accumulation removes the ~eps * |P||x| * sqrt(n)
        # evaluation floor on the residuals (see QPSolverParams docstring)
        Ax, Ax_lo = cmatvec(A, x_us)
        s, e = two_sum(Ax, -z_us)
        pres = _norm_inf(s + (e + Ax_lo))
        Px, Px_lo = cmatvec(P, x_us)
        Aty, Aty_lo = cdot(A, y_us[:, :, None], axis=1)
        s, e = two_sum(Px, Aty)
        s2, e2 = two_sum(s, q)
        dres = _norm_inf(s2 + (e2 + e + Px_lo + Aty_lo))
    else:
        Ax = jnp.einsum("bmn,bn->bm", A, x_us)
        pres = _norm_inf(Ax - z_us)
        Px = jnp.einsum("bnk,bk->bn", P, x_us)
        Aty = jnp.einsum("bmn,bm->bn", A, y_us)
        dres = _norm_inf(Px + q + Aty)
    prim_ok = pres <= eps_abs + eps_rel * jnp.maximum(_norm_inf(Ax), _norm_inf(z_us))
    dscale = jnp.maximum(_norm_inf(Px), jnp.maximum(_norm_inf(q), _norm_inf(Aty)))
    dual_ok = dres <= eps_abs + eps_rel * dscale

    # normalized-residual balance for adaptive rho (OSQP sec. 5.2):
    # ratio > 1 -> primal residual dominates -> raise rho, and vice versa
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    pscale = jnp.maximum(_norm_inf(Ax), _norm_inf(z_us))
    pn = pres / jnp.maximum(pscale, tiny)
    dn = dres / jnp.maximum(dscale, tiny)
    ratio = jnp.where(
        jnp.logical_and(pn > 0, dn > 0), pn / jnp.maximum(dn, tiny), 1.0
    )

    optimal = jnp.logical_and(prim_ok, dual_ok)

    # --- primal infeasibility certificate (dy direction)
    E = _norm_inf(dy_us)
    Atdy = jnp.einsum("bmn,bm->bn", A, dy_us)
    u_inf = jnp.isinf(u)
    l_inf = jnp.isinf(l)
    viol = jnp.logical_or(
        jnp.logical_and(u_inf, dy_us > eps_pinf * E[:, None]),
        jnp.logical_and(l_inf, dy_us < -eps_pinf * E[:, None]),
    ).any(axis=1)
    sum_term = jnp.sum(
        jnp.where(u_inf, 0.0, u * jnp.maximum(0.0, dy_us))
        + jnp.where(l_inf, 0.0, l * jnp.minimum(0.0, dy_us)),
        axis=1,
    )
    prim_inf = jnp.logical_and(
        jnp.logical_not(viol),
        jnp.maximum(_norm_inf(Atdy), sum_term) < eps_pinf * E,
    )

    # --- dual infeasibility certificate (dx direction)
    dxn = _norm_inf(dx_us)
    Pdx = jnp.einsum("bnk,bk->bn", P, dx_us)
    Adx = jnp.einsum("bmn,bn->bm", A, dx_us)
    tol = eps_dinf * dxn[:, None]
    row_ok = jnp.where(
        u_inf,
        Adx >= -tol,
        jnp.where(l_inf, Adx <= tol, jnp.abs(Adx) < tol),
    ).all(axis=1)
    dual_inf = (
        (_norm_inf(Pdx) <= eps_dinf * dxn)
        & (jnp.einsum("bn,bn->b", q, dx_us) <= eps_dinf * dxn)
        & row_ok
    )

    status = jnp.where(
        diverged,
        _UNKNOWN,
        jnp.where(
            optimal,
            _OPTIMAL,
            jnp.where(prim_inf, _PRIMAL_INF, jnp.where(dual_inf, _DUAL_INF, _RUNNING)),
        ),
    ).astype(jnp.int32)
    return status, pres, dres, ratio


# ------------------------------------------------------------------- polish


def _polish(prm, P, q, A, l, u, c, sx, sy, x, y):
    """Masked active-set polish in scaled variables; cf. qp_solver.hpp:93-204.

    The reduced KKT system over active constraints is embedded into a fixed
    (n+m)x(n+m) system: inactive multiplier rows become the trivial equation
    ``-nu_i = 0``, so shapes stay static.  Returns (x_pol, y_pol, ok)."""
    dt = P.dtype
    B, m, n = A.shape
    eps = jnp.finfo(dt).eps

    lower_act = jnp.logical_and(y < -100 * eps, jnp.isfinite(l))
    upper_act = jnp.logical_and(y > 100 * eps, jnp.isfinite(u))
    # Equality rows (l == u) are active at EVERY solution regardless of the
    # multiplier's sign or size; the |y| > 100 eps rule alone drops those
    # whose y ~ 0, and the polished point then satisfies them only at the
    # looser ADMM tolerance (measured f32 SQP consequence: transcribed
    # equality rows stuck at ~eps_rel * |Ax| ~ 1e-4 violation, capping the
    # achievable KKT certificate).
    eq_row = jnp.logical_and(jnp.isfinite(l), (u - l) <= 0)
    upper_act = jnp.logical_and(
        jnp.logical_or(upper_act, eq_row), jnp.logical_not(lower_act)
    )
    act = jnp.logical_or(lower_act, upper_act)
    D = act.astype(dt)

    Ps = c[:, None, None] * sx[:, :, None] * sx[:, None, :] * P
    As = sy[:, :, None] * A * sx[:, None, :]
    qs = c[:, None] * sx * q
    ls = sy * l
    us = sy * u

    As_act = As * D[:, :, None]
    # Perturbed system Hp = [[Ps + delta I, Aa'], [Aa, -Dd]] with Dd > 0
    # diagonal (delta on active rows, 1 on decoupled inactive rows).
    #
    # Factorization strategy per dtype:
    #   f64: SPD Schur complement + Cholesky.  TPU implements no f64 LU, and
    #        f64 absorbs the 1/delta ~ 1e6 conditioning of the Schur form.
    #   f32: LU of the full (n+m) quasi-definite system (stable pivoting keeps
    #        the +-delta blocks intact; the Schur form overflows f32).
    Dd = jnp.where(act, jnp.asarray(prm.delta, dt), jnp.asarray(1.0, dt))  # (B, m)
    h_x = -qs  # (B, n)
    h_nu = jnp.where(act, jnp.where(lower_act, ls, us), 0.0)  # (B, m)

    if dt == jnp.float64:
        S = (
            Ps
            + prm.delta * jnp.eye(n, dtype=dt)[None]
            + jnp.einsum("bmn,bm,bmk->bnk", As_act, 1.0 / Dd, As_act)
        )
        L = jnp.linalg.cholesky(S)
        chol_ok = jnp.isfinite(L).all(axis=(1, 2))
        L = jnp.where(chol_ok[:, None, None], L, jnp.eye(n, dtype=dt)[None])

        def hp_solve(r_x, r_nu):
            rhs = r_x + jnp.einsum("bmn,bm->bn", As_act, r_nu / Dd)
            tt = jax.scipy.linalg.solve_triangular(L, rhs[..., None], lower=True)
            xs_ = jax.scipy.linalg.solve_triangular(L, tt, lower=True, trans=1)[..., 0]
            nus = (jnp.einsum("bmn,bn->bm", As_act, xs_) - r_nu) / Dd
            return xs_, nus

    else:
        zero_mm = jnp.zeros((B, m, m), dt)
        Hp = jnp.concatenate(
            [
                jnp.concatenate(
                    [Ps + prm.delta * jnp.eye(n, dtype=dt)[None],
                     jnp.swapaxes(As_act, 1, 2)],
                    axis=2,
                ),
                jnp.concatenate(
                    [As_act, zero_mm - Dd[:, :, None] * jnp.eye(m, dtype=dt)[None]],
                    axis=2,
                ),
            ],
            axis=1,
        )
        lu, piv = jax.scipy.linalg.lu_factor(Hp)
        chol_ok = jnp.isfinite(lu).all(axis=(1, 2))

        def hp_solve(r_x, r_nu):
            r = jnp.concatenate([r_x, r_nu], axis=1)
            t = jax.scipy.linalg.lu_solve((lu, piv), r[..., None])[..., 0]
            return t[:, :n], t[:, n:]

    x_t = jnp.zeros((B, n), dt)
    nu_t = jnp.zeros((B, m), dt)
    for _ in range(prm.polish_iter):
        # residual of the UNperturbed system H = [[Ps, Aa'], [Aa, 0]],
        # COMPENSATED (utils/compensated.py): computed in plain f32 the
        # residual carries ~eps * |H||t| evaluation noise (~1e-4 unscaled on
        # collocation subproblems), which caps what iterative refinement can
        # recover — and the SQP's stationarity floor inherits the polished
        # dual's accuracy.  Error-free transforms push the refinement to the
        # f32 representation limit of (x, nu) instead.  ~Free in f64.
        hi1, lo1 = cmatvec(Ps, x_t)
        hi2, lo2 = cdot(As_act, nu_t[:, :, None], axis=1)
        s, e = two_sum(hi1, hi2)
        r_x = (h_x - s) - (e + lo1 + lo2)
        hi3, lo3 = cmatvec(As_act, x_t)
        r_nu = (h_nu - hi3) - lo3
        dx_, dnu_ = hp_solve(r_x, r_nu)
        x_t = x_t + dx_
        nu_t = nu_t + dnu_

    ok = jnp.logical_and(
        chol_ok,
        jnp.logical_and(jnp.isfinite(x_t).all(axis=1), jnp.isfinite(nu_t).all(axis=1)),
    )
    y_pol = jnp.where(act, nu_t, y)
    return x_t, y_pol, ok


# -------------------------------------------------------------------- solver


class QPFactors(NamedTuple):
    """Precomputed per-problem scaling + KKT factorization.

    For problem families whose P and A are fixed while q/l/u vary between
    solves (e.g. LTI tracking MPC), computing this once and passing it to
    :func:`solve_qp_batch` removes the dominant per-solve cost (Ruiz sweeps,
    Cholesky, inverse).  No reference analog — the reference refactorizes
    every solve (qp_solver.hpp:423-429)."""

    c: jax.Array  # (B,) cost scaling
    sx: jax.Array  # (B, n) variable scaling
    sy: jax.Array  # (B, m) constraint scaling
    rho: jax.Array  # (B, m) per-row dual step
    Ps: jax.Array  # (B, n, n) scaled P
    As: jax.Array  # (B, m, n) scaled A
    Mred: jax.Array  # (B, n, n) reduced KKT matrix
    Minv: jax.Array  # (B, n, n) its SPD inverse
    fact_ok: jax.Array  # (B,) factorization success


def _factorize(P, q, A, l, u, prm):
    dt = P.dtype
    B, m, n = A.shape
    inf = jnp.asarray(jnp.inf, dt)

    if prm.scaling:
        c, sx, sy = jax.vmap(_ruiz)(P, q, A)
    else:
        c = jnp.ones((B,), dt)
        sx = jnp.ones((B, n), dt)
        sy = jnp.ones((B, m), dt)

    # per-row rho (qp_solver.hpp:361-374)
    unbounded = jnp.logical_and(l == -inf, u == inf)
    eq = sy * jnp.abs(l - u) < 1e-5  # NaN (inf-inf) compares False => inequality
    rho_bar = jnp.asarray(prm.rho, dt)
    rho = jnp.where(
        unbounded,
        jnp.asarray(1e-6, dt),
        jnp.where(eq, prm.rho_eq_scale * rho_bar, rho_bar),
    )

    Ps = c[:, None, None] * sx[:, :, None] * sx[:, None, :] * P
    As = sy[:, :, None] * A * sx[:, None, :]

    Mred = (
        Ps
        + prm.sigma * jnp.eye(n, dtype=dt)[None]
        + jnp.einsum("bmn,bm,bmk->bnk", As, rho, As)
    )
    L = jnp.linalg.cholesky(Mred)
    fact_fail = jnp.logical_not(jnp.isfinite(L).all(axis=(1, 2)))
    # neutralize broken factors so frozen elements don't poison the batch
    L = jnp.where(fact_fail[:, None, None], jnp.eye(n, dtype=dt)[None], L)

    # Explicit SPD inverse M^{-1} = L^{-T} L^{-1}, built with ONE blocked
    # triangular solve (n right-hand sides -> matmul-friendly).  Per-ADMM-
    # iteration KKT solves then become batched matvecs on the MXU; per-vector
    # triangular substitution is pathologically slow on TPU.
    eyeN = jnp.broadcast_to(jnp.eye(n, dtype=dt), (B, n, n))
    Linv = jax.scipy.linalg.solve_triangular(L, eyeN, lower=True)
    Minv = jnp.einsum("bkn,bkm->bnm", Linv, Linv)

    return QPFactors(
        c=c, sx=sx, sy=sy, rho=rho, Ps=Ps, As=As, Mred=Mred, Minv=Minv,
        fact_ok=jnp.logical_not(fact_fail),
    )


@functools.partial(jax.jit, static_argnames=("prm",))
def qp_factorize(qp: QuadraticProgram, prm: QPSolverParams = QPSolverParams()) -> QPFactors:
    """Precompute scaling and KKT factorization for a (batched) QP template."""
    with jax.default_matmul_precision("highest"):
        P, q, A, l, u = qp
        return _factorize(P, q, A, l, u, prm)


# --------------------------------------------- lane (batch-trailing) backend
#
# For fleets of TINY per-problem QPs (the ASIF shape: n = nu+1 variables,
# m ~ K rows) neither standard path is good: the XLA path re-reads the
# (B, m, n) constraint stack from HBM every iteration with its minor dims
# padded to (8, 128) tiles (~40x waste at n=3), and the per-problem Pallas
# kernel pads n, m to 128 inside VMEM (~1000x wasted compute).  The lane
# backend stores every matrix batch-TRAILING — A as (m, n, B), the batch on
# the lanes — and runs scaling, factorization, the ADMM iteration, and the
# stopping checks entirely in that layout with broadcast-multiply-sum
# contractions (never dot_general, which XLA would re-layout).  Same
# algorithm, same semantics, parity-tested against the XLA path.


def _ruiz_lane(Pt, qt, At, max_ruiz_iter: int = 10):
    """Trailing-layout modified-Ruiz equilibration; mirrors jax.vmap(_ruiz)
    including its per-element convergence masking."""
    dt = Pt.dtype
    n, _, B = Pt.shape
    m = At.shape[0]

    colnorm_P = jnp.max(jnp.abs(Pt), axis=0)  # (n, B)
    colnorm_P = jnp.where(colnorm_P == 0, 1.0, colnorm_P)
    c = 1.0 / jnp.maximum(
        jnp.asarray(1e-6, dt),
        jnp.maximum(jnp.mean(colnorm_P, axis=0), jnp.max(jnp.abs(qt), axis=0)),
    )  # (B,)

    def body(carry):
        sx, sy, it, err = carry
        active = jnp.logical_or(it == 0, err > 0.1)  # (B,) per-element cond
        Pn = jnp.abs(c[None, None, :] * sx[:, None, :] * sx[None, :, :] * Pt)
        An = jnp.abs(sy[:, None, :] * At * sx[None, :, :])
        sx_inc = jnp.maximum(jnp.max(Pn, axis=0), jnp.max(An, axis=0))  # (n, B)
        sy_inc = jnp.max(An, axis=1)  # (m, B)
        sx_inc = jnp.where(sx_inc == 0, 1.0, sx_inc)
        sy_inc = jnp.where(sy_inc == 0, 1.0, sy_inc)
        err_new = jnp.maximum(
            jnp.max(jnp.abs(sx_inc - 1.0), axis=0),
            jnp.max(jnp.abs(sy_inc - 1.0), axis=0),
        )
        sx_new = sx * jax.lax.rsqrt(jnp.maximum(sx_inc, 1e-8))
        sy_new = sy * jax.lax.rsqrt(jnp.maximum(sy_inc, 1e-8))
        sx = jnp.where(active[None, :], sx_new, sx)
        sy = jnp.where(active[None, :], sy_new, sy)
        err = jnp.where(active, err_new, err)
        return sx, sy, it + 1, err

    def cond(carry):
        _, _, it, err = carry
        return jnp.logical_or(
            it == 0, jnp.logical_and(it <= max_ruiz_iter, (err > 0.1).any())
        )

    sx0 = jnp.ones((n, B), dt)
    sy0 = jnp.ones((m, B), dt)
    sx, sy, _, _ = lax.while_loop(
        cond, body, (sx0, sy0, jnp.int32(0), jnp.full((B,), jnp.inf, dt))
    )
    return c, sx, sy


def _factorize_lane(Pt, qt, At, lt, ut, prm):
    """Trailing-layout scaling + reduced-KKT factorization (cf. _factorize)."""

    dt = Pt.dtype
    n, _, B = Pt.shape
    m = At.shape[0]
    inf = jnp.asarray(jnp.inf, dt)

    if prm.scaling:
        c, sx, sy = _ruiz_lane(Pt, qt, At)
    else:
        c = jnp.ones((B,), dt)
        sx = jnp.ones((n, B), dt)
        sy = jnp.ones((m, B), dt)

    unbounded = jnp.logical_and(lt == -inf, ut == inf)
    eq = sy * jnp.abs(lt - ut) < 1e-5  # NaN (inf-inf) compares False
    rho_bar = jnp.asarray(prm.rho, dt)
    rho = jnp.where(
        unbounded,
        jnp.asarray(1e-6, dt),
        jnp.where(eq, prm.rho_eq_scale * rho_bar, rho_bar),
    )  # (m, B)

    Pst = c[None, None, :] * sx[:, None, :] * sx[None, :, :] * Pt
    Ast = sy[:, None, :] * At * sx[None, :, :]

    Mredt, Minvt, fact_fail = _lane_chol_inverse(Pst, Ast, rho, prm.sigma)
    return c, sx, sy, rho, Pst, Ast, Mredt, Minvt, jnp.logical_not(fact_fail)


# Above this n the unrolled chol_lane/chol_solve_lane trace O(n^3) vector ops
# (minutes of compile) and the broadcast A' rho A materializes an
# (m, n, n, B) intermediate; the mid-size path below factorizes batch-LEADING
# instead — one MXU einsum + XLA's batched Cholesky/triangular-solve — and
# transposes the results back to the lane layout once per (re)factorization.
_LANE_UNROLL_MAX = 32


def _lane_chol_inverse(Pst, Ast, rho, sigma):
    """Reduced-KKT ``Mred = Ps + sigma I + A' rho A`` and its inverse for
    (n, n, B)/(m, n, B) lane stacks; returns (Mredt, Minvt, fact_fail)."""
    dt = Pst.dtype
    n, _, B = Pst.shape
    if n <= _LANE_UNROLL_MAX:
        ArA = ((Ast * rho[:, None, :])[:, :, None, :] * Ast[:, None, :, :]).sum(
            axis=0
        )
        Mredt = Pst + sigma * jnp.eye(n, dtype=dt)[:, :, None] + ArA
        L = chol_lane(Mredt)
        fact_fail = jnp.logical_not(jnp.isfinite(L).all(axis=(0, 1)))  # (B,)
        L = jnp.where(
            fact_fail[None, None, :], jnp.eye(n, dtype=dt)[:, :, None], L
        )
        eyeB = jnp.broadcast_to(jnp.eye(n, dtype=dt)[:, :, None], (n, n, B))
        Minvt = chol_solve_lane(L, eyeB)
        return Mredt, Minvt, fact_fail

    # mid-size path (32 < n): batch-leading factorization, lane iteration
    A_bl = jnp.moveaxis(Ast, -1, 0)  # (B, m, n)
    ArA_bl = jnp.einsum("bmi,bm,bmj->bij", A_bl, rho.T, A_bl)
    Mred_bl = (
        jnp.moveaxis(Pst, -1, 0)
        + sigma * jnp.eye(n, dtype=dt)[None]
        + ArA_bl
    )
    L_bl = jnp.linalg.cholesky(Mred_bl)
    fact_fail = jnp.logical_not(jnp.isfinite(L_bl).all(axis=(1, 2)))  # (B,)
    L_bl = jnp.where(fact_fail[:, None, None], jnp.eye(n, dtype=dt)[None], L_bl)
    eye_bl = jnp.broadcast_to(jnp.eye(n, dtype=dt)[None], (B, n, n))
    Y = lax.linalg.triangular_solve(
        L_bl, eye_bl, left_side=True, lower=True
    )
    Minv_bl = lax.linalg.triangular_solve(
        L_bl, Y, left_side=True, lower=True, transpose_a=True
    )
    return (
        jnp.moveaxis(Mred_bl, 0, -1),
        jnp.moveaxis(Minv_bl, 0, -1),
        fact_fail,
    )


def _stopping_check_lane(prm, Pt, qt, At, lt, ut, x_us, y_us, z_us, dx_us, dy_us):
    """Trailing-layout port of _stopping_check (same certificates/criteria);
    all matrix stacks (k, j, B), vectors (k, B)."""

    dt = Pt.dtype
    eps_abs = jnp.asarray(prm.eps_abs, dt)
    eps_rel = jnp.asarray(prm.eps_rel, dt)
    eps_pinf = jnp.asarray(prm.eps_primal_inf, dt)
    eps_dinf = jnp.asarray(prm.eps_dual_inf, dt)

    def ninf(v):  # (k, B) -> (B,)
        return jnp.max(jnp.abs(v), axis=0)

    A_mv = lambda xv: (At * xv[None, :, :]).sum(axis=1)  # (m, B)
    AT_mv = lambda v: (At * v[:, None, :]).sum(axis=0)  # (n, B)

    diverged = jnp.logical_not(
        jnp.logical_and(
            jnp.isfinite(x_us).all(axis=0), jnp.isfinite(y_us).all(axis=0)
        )
    )

    if prm.compensated_check:
        # trailing-layout compensated residuals (cf. _stopping_check)
        Ax, Ax_lo = cdot(At, x_us[None, :, :], axis=1)  # (m, B)
        s, e = two_sum(Ax, -z_us)
        pres = ninf(s + (e + Ax_lo))
        Px, Px_lo = cdot(Pt, x_us[None, :, :], axis=1)  # (n, B)
        Aty, Aty_lo = cdot(At, y_us[:, None, :], axis=0)  # (n, B)
        s, e = two_sum(Px, Aty)
        s2, e2 = two_sum(s, qt)
        dres = ninf(s2 + (e2 + e + Px_lo + Aty_lo))
    else:
        Ax = A_mv(x_us)
        pres = ninf(Ax - z_us)
        Px = mv_lane(Pt, x_us)
        Aty = AT_mv(y_us)
        dres = ninf(Px + qt + Aty)
    pscale = jnp.maximum(ninf(Ax), ninf(z_us))
    prim_ok = pres <= eps_abs + eps_rel * pscale
    dscale = jnp.maximum(ninf(Px), jnp.maximum(ninf(qt), ninf(Aty)))
    dual_ok = dres <= eps_abs + eps_rel * dscale

    # normalized-residual balance for adaptive rho (OSQP sec. 5.2):
    # ratio > 1 -> primal residual dominates -> raise rho, and vice versa
    tiny = jnp.asarray(jnp.finfo(dt).tiny, dt)
    pn = pres / jnp.maximum(pscale, tiny)
    dn = dres / jnp.maximum(dscale, tiny)
    ratio = jnp.where(
        jnp.logical_and(pn > 0, dn > 0), pn / jnp.maximum(dn, tiny), 1.0
    )

    optimal = jnp.logical_and(prim_ok, dual_ok)

    E = ninf(dy_us)
    Atdy = AT_mv(dy_us)
    u_inf = jnp.isinf(ut)
    l_inf = jnp.isinf(lt)
    viol = jnp.logical_or(
        jnp.logical_and(u_inf, dy_us > eps_pinf * E[None, :]),
        jnp.logical_and(l_inf, dy_us < -eps_pinf * E[None, :]),
    ).any(axis=0)
    sum_term = jnp.sum(
        jnp.where(u_inf, 0.0, ut * jnp.maximum(0.0, dy_us))
        + jnp.where(l_inf, 0.0, lt * jnp.minimum(0.0, dy_us)),
        axis=0,
    )
    prim_inf = jnp.logical_and(
        jnp.logical_not(viol),
        jnp.maximum(ninf(Atdy), sum_term) < eps_pinf * E,
    )

    dxn = ninf(dx_us)
    Pdx = mv_lane(Pt, dx_us)
    Adx = A_mv(dx_us)
    tol = eps_dinf * dxn[None, :]
    row_ok = jnp.where(
        u_inf,
        Adx >= -tol,
        jnp.where(l_inf, Adx <= tol, jnp.abs(Adx) < tol),
    ).all(axis=0)
    dual_inf = (
        (ninf(Pdx) <= eps_dinf * dxn)
        & ((qt * dx_us).sum(axis=0) <= eps_dinf * dxn)
        & row_ok
    )

    status = jnp.where(
        diverged,
        _UNKNOWN,
        jnp.where(
            optimal,
            _OPTIMAL,
            jnp.where(prim_inf, _PRIMAL_INF, jnp.where(dual_inf, _DUAL_INF, _RUNNING)),
        ),
    ).astype(jnp.int32)
    return status, pres, dres, ratio


def _solve_qp_batch_lane(prm, P, q, A, l, u, warmstart, factors):
    """Batch-trailing solve; inputs/outputs batch-leading (transposed once)."""

    dt = P.dtype
    B, m, n = A.shape
    # n <= 32 uses the fully-unrolled lane factorization; 32 < n factorizes
    # batch-leading on the MXU and iterates in the lane layout (the
    # batch-on-lanes (n, n, B) stacks avoid the 128-lane padding that evicts
    # the XLA path's loop-invariant matrices from VMEM).  Under the honest
    # fresh-inputs chained protocol (benchmarks/QP_BENCH.json) single-shot
    # B=256 fleets are per-iteration kernel-overhead-bound and lane runs
    # ~5-10% ahead of the XLA path across the 32 < n <= 96 band (earlier
    # 100x+ figures came from a timing protocol the tunnel could replay);
    # the layout's big wins are the reuse paths built on it (ekf_fleet_*,
    # asif fleet transcription — see README).  Past VMEM capacity
    # (~3 n^2 B floats) the loop streams from HBM and the advantage shrinks
    # to the padding ratio; there is no hard cap.
    inf = jnp.asarray(jnp.inf, dt)

    Pt = jnp.moveaxis(P, 0, -1)
    At = jnp.moveaxis(A, 0, -1)
    qt, lt, ut = q.T, l.T, u.T

    if factors is None:
        c, sx, sy, rho, Pst, Ast, Mredt, Minvt, fact_ok = _factorize_lane(
            Pt, qt, At, lt, ut, prm
        )
    else:
        c = factors.c
        sx = factors.sx.T
        sy = factors.sy.T
        rho = factors.rho.T
        Pst = jnp.moveaxis(factors.Ps, 0, -1)
        Ast = jnp.moveaxis(factors.As, 0, -1)
        Mredt = jnp.moveaxis(factors.Mred, 0, -1)
        Minvt = jnp.moveaxis(factors.Minv, 0, -1)
        fact_ok = factors.fact_ok

    # trivial infeasibility (qp_solver.hpp:361-364)
    bad_row = jnp.logical_or(lt == inf, jnp.logical_or(ut == -inf, (ut - lt) < 0))
    trivially_infeasible = bad_row.any(axis=0)
    status0 = jnp.where(
        trivially_infeasible,
        _PRIMAL_INF,
        jnp.where(jnp.logical_not(fact_ok), _UNKNOWN, _RUNNING),
    ).astype(jnp.int32)

    qs = c[None, :] * sx * qt
    ls = sy * lt
    us = sy * ut

    A_mv = lambda xv: (At * xv[None, :, :]).sum(axis=1)

    As_mv = lambda xv: (Ast * xv[None, :, :]).sum(axis=1)  # (m, B)
    AsT_mv = lambda v: (Ast * v[:, None, :]).sum(axis=0)  # (n, B)

    if warmstart is not None:
        x0 = warmstart.primal.T / sx
        y0 = c[None, :] * warmstart.dual.T / sy
        z0 = sy * A_mv(warmstart.primal.T)
    else:
        x0 = jnp.zeros((n, B), dt)
        y0 = jnp.zeros((m, B), dt)
        z0 = jnp.zeros((m, B), dt)

    n_refine = max(0, prm.kkt_refine_iters)

    def Msolve(Minvt_, Mredt_, r):
        t = mv_lane(Minvt_, r)
        for _ in range(n_refine):
            resid = r - mv_lane(Mredt_, t)
            t = t + mv_lane(Minvt_, resid)
        return t

    alpha = jnp.asarray(prm.alpha, dt)
    # rows whose rho is pinned (unbounded, qp_solver.hpp:361-374) never adapt
    rho_pinned = jnp.logical_and(lt == -inf, ut == inf)

    def _refactor(rho_):
        Mredt_, Minvt_, bad = _lane_chol_inverse(Pst, Ast, rho_, prm.sigma)
        return Mredt_, Minvt_, bad

    def cond(state):
        it = state[0]
        status = state[4]
        return jnp.logical_and(it < prm.max_iter, (status == _RUNNING).any())

    def body(state):
        it, x, z, y, status, iters, pres, dres, rho_c, Mredt_c, Minvt_c = state
        x_old, y_old = x, y

        rhs = prm.sigma * x - qs + AsT_mv(rho_c * z - y)
        xt = Msolve(Minvt_c, Mredt_c, rhs)
        zt = As_mv(xt)

        xn = alpha * xt + (1 - alpha) * x
        zn = jnp.clip(alpha * zt + (1 - alpha) * z + y / rho_c, ls, us)
        yn = y + rho_c * (alpha * zt + (1 - alpha) * z - zn)

        def do_check(_):
            x_us = sx * xn
            y_us = sy * yn / c[None, :]
            z_us = zn / sy
            dx_us = sx * (xn - x_old)
            dy_us = sy * (yn - y_old) / c[None, :]
            st, pr, dr, ratio = _stopping_check_lane(
                prm, Pt, qt, At, lt, ut, x_us, y_us, z_us, dx_us, dy_us
            )
            if prm.verbose:
                jax.debug.print(
                    "[qp/lane] iter {i}: running {r}/{b}  pres med {pm:.3e} "
                    "max {px:.3e}  dres med {dm:.3e} max {dx:.3e}",
                    i=it,
                    r=jnp.sum(st == _RUNNING),
                    b=B,
                    pm=jnp.median(pr),
                    px=jnp.max(pr),
                    dm=jnp.median(dr),
                    dx=jnp.max(dr),
                )
            return st, pr, dr, ratio

        def skip(_):
            return (
                jnp.full((B,), _RUNNING, jnp.int32),
                pres,
                dres,
                jnp.ones((B,), dt),
            )

        check_now = (it % prm.stop_check_iter) == (1 % prm.stop_check_iter)
        new_status, pres_n, dres_n, ratio = lax.cond(check_now, do_check, skip, None)

        run = status == _RUNNING
        runc = run[None, :]
        x = jnp.where(runc, xn, x)
        z = jnp.where(runc, zn, z)
        y = jnp.where(runc, yn, y)
        status = jnp.where(run, new_status, status)
        iters = jnp.where(run, it + 1, iters)
        pres = jnp.where(run, pres_n, pres)
        dres = jnp.where(run, dres_n, dres)

        if prm.adaptive_rho:
            # residual-balancing update (OSQP sec. 5.2, absent from the
            # reference's embedded solver): rho <- rho sqrt(pres_n/dres_n)
            # per element, refactorizing the reduced KKT in-loop (cheap at
            # lane sizes).  Only elements whose imbalance exceeds the
            # tolerance band adapt, and only while still running.
            mult = jnp.sqrt(ratio)
            tol = jnp.asarray(prm.adaptive_rho_tol, dt)
            adapt_e = jnp.logical_and(
                new_status == _RUNNING,
                jnp.logical_and(
                    run, jnp.logical_or(mult > tol, mult < 1.0 / tol)
                ),
            )
            mult = jnp.where(adapt_e, mult, 1.0)
            rho_new = jnp.clip(rho_c * mult[None, :], 1e-6, 1e6)
            rho_new = jnp.where(rho_pinned, jnp.asarray(1e-6, dt), rho_new)

            def refac(_):
                Mred_n, Minv_n, bad = _refactor(rho_new)
                # a failed refactorization keeps the previous rho/factors
                keep = bad[None, :]
                rho_k = jnp.where(keep, rho_c, rho_new)
                Mred_k = jnp.where(keep[None], Mredt_c, Mred_n)
                Minv_k = jnp.where(keep[None], Minvt_c, Minv_n)
                return rho_k, Mred_k, Minv_k

            def keep_f(_):
                return rho_c, Mredt_c, Minvt_c

            rho_c, Mredt_c, Minvt_c = lax.cond(
                adapt_e.any(), refac, keep_f, None
            )

        return it + 1, x, z, y, status, iters, pres, dres, rho_c, Mredt_c, Minvt_c

    init = (
        jnp.int32(0),
        x0,
        z0,
        y0,
        status0,
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), inf),
        jnp.full((B,), inf),
        rho,
        Mredt,
        Minvt,
    )
    out = lax.while_loop(cond, body, init)
    _, x, z, y, status, iters, pres, dres = out[:8]
    status = jnp.where(status == _RUNNING, _MAX_ITER, status)

    # finalize (and optional polish) in the standard batch-leading layout —
    # one-time costs, shared with the other backends for exact parity
    return _finalize_solution(
        prm, P, q, A, l, u, c, sx.T, sy.T, x.T, y.T, status, iters, pres, dres
    )


@functools.partial(jax.jit, static_argnames=("prm",))
def solve_qp_batch(
    qp: QuadraticProgram,
    prm: QPSolverParams = QPSolverParams(),
    warmstart: Optional[QPSolution] = None,
    factors: Optional[QPFactors] = None,
) -> QPSolution:
    """Solve a batch of dense QPs; every field of ``qp`` has leading batch axis.

    One scalar while-loop drives all batch elements; per-element status and
    iteration counts are returned in the solution (reference semantics of
    QPSolver::solve, qp_solver.hpp:343-568).

    If ``factors`` is supplied (see :func:`qp_factorize`), P/A are assumed to
    match the template the factors were built from; only q/l/u are read fresh.
    """
    # TPU matmuls default to bf16 for f32 inputs, which stalls ADMM far above
    # the stopping tolerances; force full-precision accumulation throughout.
    with jax.default_matmul_precision("highest"):
        return _solve_qp_batch_impl(qp, prm, warmstart, factors)


def _solve_qp_batch_impl(qp, prm, warmstart, factors=None):
    P, q, A, l, u = qp
    dt = P.dtype
    # normalize broadcastable leading dims (e.g. a shared bound row (1, m))
    B = max(a.shape[0] for a in qp)
    m, n = A.shape[-2:]
    P = jnp.broadcast_to(P, (B, n, n))
    q = jnp.broadcast_to(q, (B, n))
    A = jnp.broadcast_to(A, (B, m, n))
    l = jnp.broadcast_to(l, (B, m))
    u = jnp.broadcast_to(u, (B, m))
    inf = jnp.asarray(jnp.inf, dt)

    # Factors may be SHARED across the batch (no leading batch axis on
    # Minv, e.g. from qp_factorize on one template problem): the LTI-MPC
    # fleet case, where the Pallas path can use real GEMM iterations.
    shared = factors is not None and factors.Minv.ndim == 2
    if prm.adaptive_rho and (prm.backend == "pallas" or shared):
        raise ValueError(
            "adaptive_rho requires per-problem factors on backend='lane' or "
            "'xla' (shared-factor batches share one rho across the fleet, and "
            "the fused Pallas kernel pins its factorization in VMEM)"
        )
    if prm.backend == "lane" and not shared:
        # batch-trailing path for fleets of tiny QPs; shared-factor batches
        # fall through to the XLA shared-GEMM path below (already efficient)
        return _solve_qp_batch_lane(prm, P, q, A, l, u, warmstart, factors)
    if factors is None:
        factors = _factorize(P, q, A, l, u, prm)
    c, sx, sy, rho, Ps, As, Mred, Minv, fact_ok = factors

    # ---- trivial infeasibility (qp_solver.hpp:361-364)
    bad_row = jnp.logical_or(l == inf, jnp.logical_or(u == -inf, (u - l) < 0))
    trivially_infeasible = bad_row.any(axis=1)

    status0 = jnp.where(
        trivially_infeasible,
        _PRIMAL_INF,
        jnp.where(jnp.logical_not(fact_ok), _UNKNOWN, _RUNNING),
    ).astype(jnp.int32)

    # ---- scaled vectors (broadcast over the batch when factors are shared)
    if shared:
        qs = c * sx[None, :] * q
        ls = sy[None, :] * l
        us = sy[None, :] * u
    else:
        qs = c[:, None] * sx * q
        ls = sy * l
        us = sy * u

    # batched copies of the scalings for warmstart scaling / finalize
    if shared:
        cB = jnp.broadcast_to(c, (B,))
        sxB = jnp.broadcast_to(sx[None, :], (B, n))
        syB = jnp.broadcast_to(sy[None, :], (B, m))
    else:
        cB, sxB, syB = c, sx, sy

    # ---- initial iterates (warmstart must be scaled, qp_solver.hpp:436-445)
    if warmstart is not None:
        x0 = warmstart.primal / sxB
        y0 = cB[:, None] * warmstart.dual / syB
        z0 = syB * jnp.einsum("bmn,bn->bm", A, warmstart.primal)
    else:
        x0 = jnp.zeros((B, n), dt)
        y0 = jnp.zeros((B, m), dt)
        z0 = jnp.zeros((B, m), dt)

    if prm.backend == "pallas":
        from .pallas_kernel import (
            admm_iterate_pallas,
            admm_iterate_pallas_shared,
            shared_kernel_fits,
        )

        interp = jax.default_backend() != "tpu"
        use_pallas = shared_kernel_fits(n, m) if shared else True
        # shared problems beyond the fused kernel's scoped-VMEM capacity
        # (padded size > 256, e.g. K>=100 MPC horizons) fall through to the
        # XLA shared-GEMM path below — same math, streamed from HBM
        if use_pallas:
            if shared:
                # straggler sort: each kernel block iterates until its
                # slowest member converges; clustering predicted-hard members
                # (by previous-solve iteration count) into the same blocks
                # frees the easy blocks to exit early.  Exact: a pure batch
                # permutation, inverted on the way out.
                do_sort = prm.sort_stragglers and warmstart is not None
                if do_sort:
                    perm = jnp.argsort(warmstart.iters)
                    inv_perm = jnp.argsort(perm)
                    take = lambda a: a[perm]
                    qs, ls, us, l_s, u_s, x0, z0, y0, status0 = (
                        take(qs), take(ls), take(us), take(l), take(u),
                        take(x0), take(z0), take(y0), take(status0),
                    )
                else:
                    l_s, u_s = l, u
                x, z, y, status, iters, pres, dres = admm_iterate_pallas_shared(
                    prm, Minv, As, Ps, qs, ls, us, rho, sx, sy, c,
                    l_s, u_s, x0, z0, y0, status0, interpret=interp,
                    block=prm.pallas_block,
                )
                if do_sort:
                    x, z, y, status, iters, pres, dres = (
                        x[inv_perm], z[inv_perm], y[inv_perm],
                        status[inv_perm], iters[inv_perm],
                        pres[inv_perm], dres[inv_perm],
                    )
            else:
                x, z, y, status, iters, pres, dres = admm_iterate_pallas(
                    prm, Minv, As, Ps, qs, ls, us, rho, sx, sy, c,
                    l, u, x0, z0, y0, status0, interpret=interp,
                )
            x = x.astype(dt)
            z = z.astype(dt)
            y = y.astype(dt)
            pres = pres.astype(dt)
            dres = dres.astype(dt)
            return _finalize_solution(
                prm, P, q, A, l, u, cB, sxB, syB, x, y, status, iters, pres, dres
            )

    # XLA iteration path.  Shared matrices stay un-broadcast: every product
    # is then a real (B, k) @ (k, j) GEMM against the one shared matrix
    # instead of B batched matvecs (and XLA never materializes B copies).
    if shared:
        AT_mv = lambda v: jnp.einsum("mn,bm->bn", As, v)  # A's v
        A_mv = lambda xv: jnp.einsum("mn,bn->bm", As, xv)  # A_s x
        Minv_mv = lambda r: jnp.einsum("nm,bm->bn", Minv, r)
        Mred_mv = lambda t: jnp.einsum("nk,bk->bn", Mred, t)
        rho = jnp.broadcast_to(rho[None, :], (B, m))
        c, sx, sy = cB, sxB, syB
    else:
        AT_mv = lambda v: jnp.einsum("bmn,bm->bn", As, v)
        A_mv = lambda xv: jnp.einsum("bmn,bn->bm", As, xv)
        Minv_mv = lambda r: jnp.einsum("bnm,bm->bn", Minv, r)
        Mred_mv = lambda t: jnp.einsum("bnk,bk->bn", Mred, t)

    n_refine = max(0, prm.kkt_refine_iters)

    def Msolve(Minv_mv_c, Mred_mv_c, r):
        t = Minv_mv_c(r)
        for _ in range(n_refine):
            resid = r - Mred_mv_c(t)
            t = t + Minv_mv_c(resid)
        return t

    alpha = jnp.asarray(prm.alpha, dt)
    adaptive = prm.adaptive_rho  # shared/pallas rejected above -> per-problem

    if adaptive:
        # rows whose rho is pinned (unbounded, qp_solver.hpp:361-374) never
        # adapt; the loop-invariant part of the reduced KKT matrix is hoisted
        rho_pinned = jnp.logical_and(l == -inf, u == inf)
        M0 = Ps + prm.sigma * jnp.eye(n, dtype=dt)[None]
        eyeN_b = jnp.broadcast_to(jnp.eye(n, dtype=dt), (B, n, n))

        def _refactor(rho_):
            Mred_n = M0 + jnp.einsum("bmn,bm,bmk->bnk", As, rho_, As)
            L = jnp.linalg.cholesky(Mred_n)
            bad = jnp.logical_not(jnp.isfinite(L).all(axis=(1, 2)))
            L = jnp.where(bad[:, None, None], jnp.eye(n, dtype=dt)[None], L)
            Linv = jax.scipy.linalg.solve_triangular(L, eyeN_b, lower=True)
            return Mred_n, jnp.einsum("bkn,bkm->bnm", Linv, Linv), bad

    def cond(state):
        it = state[0]
        status = state[4]
        return jnp.logical_and(it < prm.max_iter, (status == _RUNNING).any())

    def body(state):
        if adaptive:
            it, x, z, y, status, iters, pres, dres, rho_c, Mred_c, Minv_c = state
            Minv_mv_c = lambda r: jnp.einsum("bnm,bm->bn", Minv_c, r)
            Mred_mv_c = lambda t: jnp.einsum("bnk,bk->bn", Mred_c, t)
        else:
            it, x, z, y, status, iters, pres, dres = state
            rho_c = rho
            Minv_mv_c, Mred_mv_c = Minv_mv, Mred_mv
        x_old, y_old = x, y

        rhs = prm.sigma * x - qs + AT_mv(rho_c * z - y)
        xt = Msolve(Minv_mv_c, Mred_mv_c, rhs)
        zt = A_mv(xt)

        xn = alpha * xt + (1 - alpha) * x
        zn = jnp.clip(alpha * zt + (1 - alpha) * z + y / rho_c, ls, us)
        yn = y + rho_c * (alpha * zt + (1 - alpha) * z - zn)

        def do_check(_):
            x_us = sx * xn
            y_us = sy * yn / c[:, None]
            z_us = zn / sy
            dx_us = sx * (xn - x_old)
            dy_us = sy * (yn - y_old) / c[:, None]
            st, pr, dr, ratio = _stopping_check(
                prm, P, q, A, l, u, x_us, y_us, z_us, dx_us, dy_us
            )
            if prm.verbose:
                jax.debug.print(
                    "[qp] iter {i}: running {r}/{b}  pres med {pm:.3e} max {px:.3e}"
                    "  dres med {dm:.3e} max {dx:.3e}",
                    i=it,
                    r=jnp.sum(st == _RUNNING),
                    b=B,
                    pm=jnp.median(pr),
                    px=jnp.max(pr),
                    dm=jnp.median(dr),
                    dx=jnp.max(dr),
                )
            return st, pr, dr, ratio

        def skip(_):
            return (
                jnp.full((B,), _RUNNING, jnp.int32),
                pres,
                dres,
                jnp.ones((B,), dt),
            )

        # == (1 % stop_check_iter) so stop_check_iter == 1 means "every
        # iteration" instead of silently never checking (it % 1 is always 0)
        check_now = (it % prm.stop_check_iter) == (1 % prm.stop_check_iter)
        new_status, pres_n, dres_n, ratio = lax.cond(check_now, do_check, skip, None)

        run = status == _RUNNING
        runc = run[:, None]
        x = jnp.where(runc, xn, x)
        z = jnp.where(runc, zn, z)
        y = jnp.where(runc, yn, y)
        status = jnp.where(run, new_status, status)
        iters = jnp.where(run, it + 1, iters)
        pres = jnp.where(run, pres_n, pres)
        dres = jnp.where(run, dres_n, dres)

        if adaptive:
            # residual-balancing update (OSQP sec. 5.2, absent from the
            # reference's static-rho embedded solver): rho <- rho
            # sqrt(pres_n/dres_n) per element, refactorizing the reduced KKT
            # in-loop.  Only elements whose imbalance exceeds the tolerance
            # band adapt, and only while still running (cf. the lane backend).
            mult = jnp.sqrt(ratio)
            tol = jnp.asarray(prm.adaptive_rho_tol, dt)
            adapt_e = jnp.logical_and(
                new_status == _RUNNING,
                jnp.logical_and(
                    run, jnp.logical_or(mult > tol, mult < 1.0 / tol)
                ),
            )
            mult = jnp.where(adapt_e, mult, 1.0)
            rho_new = jnp.clip(rho_c * mult[:, None], 1e-6, 1e6)
            rho_new = jnp.where(rho_pinned, jnp.asarray(1e-6, dt), rho_new)

            def refac(_):
                Mred_n, Minv_n, bad = _refactor(rho_new)
                # a failed refactorization keeps the previous rho/factors
                keep = bad[:, None]
                rho_k = jnp.where(keep, rho_c, rho_new)
                Mred_k = jnp.where(keep[..., None], Mred_c, Mred_n)
                Minv_k = jnp.where(keep[..., None], Minv_c, Minv_n)
                return rho_k, Mred_k, Minv_k

            def keep_f(_):
                return rho_c, Mred_c, Minv_c

            rho_c, Mred_c, Minv_c = lax.cond(adapt_e.any(), refac, keep_f, None)
            return it + 1, x, z, y, status, iters, pres, dres, rho_c, Mred_c, Minv_c

        return it + 1, x, z, y, status, iters, pres, dres

    init = (
        jnp.int32(0),
        x0,
        z0,
        y0,
        status0,
        jnp.zeros((B,), jnp.int32),
        jnp.full((B,), inf),
        jnp.full((B,), inf),
    )
    if adaptive:
        init = init + (rho, Mred, Minv)
    out = lax.while_loop(cond, body, init)
    _, x, z, y, status, iters, pres, dres = out[:8]

    status = jnp.where(status == _RUNNING, _MAX_ITER, status)
    return _finalize_solution(prm, P, q, A, l, u, c, sx, sy, x, y, status, iters, pres, dres)


def _certify_point(prm, P, q, A, l, u, primal, dual):
    """Compensated KKT certificate at an arbitrary UNSCALED (primal, dual)
    point (utils/compensated.py error-free transforms).

    Used on the polished point: primal feasibility is the distance of
    ``A @ x`` to ``[l, u]`` (there is no splitting iterate ``z`` after
    polish) and dual stationarity is ``|P x + q + A' y|_inf``; compensated
    accumulation keeps f32 evaluation noise from flooring the certificate.
    Returns ``(pres, dres, passed)``."""
    dt = P.dtype
    eps_abs = jnp.asarray(prm.eps_abs, dt)
    eps_rel = jnp.asarray(prm.eps_rel, dt)
    Ax, Ax_lo = cmatvec(A, primal)
    z = jnp.clip(Ax + Ax_lo, l, u)
    s, e = two_sum(Ax, -z)
    pres = _norm_inf(s + (e + Ax_lo))
    Px, Px_lo = cmatvec(P, primal)
    Aty, Aty_lo = cdot(A, dual[:, :, None], axis=1)
    s, e = two_sum(Px, Aty)
    s2, e2 = two_sum(s, q)
    dres = _norm_inf(s2 + (e2 + e + Px_lo + Aty_lo))
    prim_ok = pres <= eps_abs + eps_rel * jnp.maximum(_norm_inf(Ax), _norm_inf(z))
    dual_ok = dres <= eps_abs + eps_rel * jnp.maximum(
        _norm_inf(Px), jnp.maximum(_norm_inf(q), _norm_inf(Aty))
    )
    finite = jnp.logical_and(
        jnp.isfinite(primal).all(axis=1), jnp.isfinite(dual).all(axis=1)
    )
    return pres, dres, jnp.logical_and(finite, jnp.logical_and(prim_ok, dual_ok))


def _finalize_solution(prm, P, q, A, l, u, c, sx, sy, x, y, status, iters, pres, dres):
    # ---- polish (only Optimal elements take the polished values; under
    # compensated_check, iteration-capped members are candidates too: the f32
    # ADMM iterate can stall ABOVE a tight eps_abs while the polished
    # active-set point — whose refinement is compensated — satisfies it, so
    # the compensated certificate at the polished point upgrades MaxIterations
    # to Optimal when it truly passes.  See QPSolverParams.compensated_check.)
    if prm.polish:
        x_pol, y_pol, ok = _polish(prm, P, q, A, l, u, c, sx, sy, x, y)
        is_opt = status == _OPTIMAL
        use = jnp.logical_and(is_opt, ok)
        if prm.compensated_check:
            primal_pol = sx * x_pol
            dual_pol = sy * y_pol / c[:, None]
            pres_p, dres_p, pass_p = _certify_point(
                prm, P, q, A, l, u, primal_pol, dual_pol
            )
            upgrade = jnp.logical_and(
                status == _MAX_ITER, jnp.logical_and(ok, pass_p)
            )
            use = jnp.logical_or(use, upgrade)
            status = jnp.where(upgrade, _OPTIMAL, status)
            # report the residuals actually measured at the adopted point
            pres = jnp.where(use, pres_p, pres)
            dres = jnp.where(use, dres_p, dres)
        x = jnp.where(use[:, None], x_pol, x)
        y = jnp.where(use[:, None], y_pol, y)
        status = jnp.where(
            jnp.logical_and(is_opt, jnp.logical_not(ok)), _POLISH_FAILED, status
        )

    # ---- unscale and finalize (qp_solver.hpp:543-548)
    primal = sx * x
    dual = sy * y / c[:, None]
    objective = jnp.einsum(
        "bn,bn->b", primal, 0.5 * jnp.einsum("bnk,bk->bn", P, primal) + q
    )
    return QPSolution(
        primal=primal,
        dual=dual,
        status=status,
        iters=iters,
        objective=objective,
        primal_res=pres,
        dual_res=dres,
    )


def solve_qp(
    qp: QuadraticProgram,
    prm: QPSolverParams = QPSolverParams(),
    warmstart: Optional[QPSolution] = None,
) -> QPSolution:
    """Solve a single dense QP (unbatched convenience wrapper; cf.
    qp_solver.hpp:779-787)."""
    qp_b = jax.tree.map(lambda a: a[None], qp)
    ws_b = None if warmstart is None else jax.tree.map(lambda a: a[None], warmstart)
    sol = solve_qp_batch(qp_b, prm, ws_b)
    return jax.tree.map(lambda a: a[0], sol)


def solve_qp_timed(
    qp: QuadraticProgram,
    prm: QPSolverParams = QPSolverParams(),
    warmstart: Optional[QPSolution] = None,
    max_time: float = float("inf"),
    chunk_iter: int = 200,
) -> QPSolution:
    """Solve with a host-level wall-clock budget (the role of the reference's
    ``max_time``, qp_solver.hpp:46-47,529-533).

    A jitted kernel cannot read the wall clock, so the budget lives at the
    host: the batched solve runs in chunks of ``chunk_iter`` ADMM iterations,
    carrying primal/dual across chunks as warmstarts, and checks the clock
    between chunks (the host analog of the reference's per-stopping-check
    clock read).  Elements still unconverged when the budget expires are
    returned with status ``MaxTime``; ``iters`` accumulates across chunks.

    Accepts single (unbatched) or batched ``qp``.  Note the first chunk
    includes XLA compile time unless the shapes were warmed up.
    """
    import dataclasses as _dc
    import time as _time

    import numpy as np

    batched = qp.P.ndim == 3
    qp_b = qp if batched else jax.tree.map(lambda a: a[None], qp)
    ws = warmstart
    if ws is not None and not batched:
        ws = jax.tree.map(lambda a: a[None], ws)

    deadline = _time.monotonic() + max_time
    total = 0
    iters_acc = None
    unconverged_prev = None
    sol = None
    while True:
        this_chunk = min(chunk_iter, prm.max_iter - total)
        prm_c = _dc.replace(prm, max_iter=this_chunk)
        sol = solve_qp_batch(qp_b, prm_c, ws)
        jax.block_until_ready(sol.primal)
        # accumulate iters only for elements still unconverged at chunk entry:
        # converged elements re-enter as warmstarts (static shapes force a
        # re-solve) and their few re-convergence iterations are not new work
        # (cf. qp_solver.hpp:529-533 iter counting under the time budget)
        if iters_acc is None:
            iters_acc = sol.iters
        else:
            iters_acc = iters_acc + jnp.where(
                jnp.asarray(unconverged_prev), sol.iters, 0
            )
        total += this_chunk
        unconverged = np.asarray(sol.status) == _MAX_ITER
        if not unconverged.any() or total >= prm.max_iter:
            break
        if _time.monotonic() >= deadline:
            status = jnp.where(
                jnp.asarray(unconverged),
                jnp.int32(int(QPSolutionStatus.MaxTime)),
                sol.status,
            )
            sol = sol._replace(status=status)
            break
        ws = sol
        unconverged_prev = unconverged
    sol = sol._replace(iters=iters_acc)
    if not batched:
        sol = jax.tree.map(lambda a: a[0], sol)
    return sol


def qp_phase_timings(
    qp: QuadraticProgram,
    prm: QPSolverParams = QPSolverParams(),
    warmstart: Optional[QPSolution] = None,
    reps: int = 3,
) -> dict:
    """Measured per-phase wall-time breakdown of a (batched) QP solve — the
    TPU-native analog of the reference verbose mode's Matrix-filling /
    Factorization / Iteration / Polish table (qp_solver.hpp:550-565).

    Inside one jitted program the phases fuse and no in-program clock
    exists, so the breakdown is measured by compiling and timing nested
    PREFIXES of the pipeline and differencing:

    * ``factor_ms``   — scaling + KKT assembly + factorization
      (``qp_factorize``), timed directly;
    * ``iterate_ms``  — (full solve, polish off) − factor_ms;
    * ``polish_ms``   — (full solve, polish on) − (full solve, polish off),
      0.0 when ``prm.polish`` is already off;
    * ``total_ms``    — the full configured solve.

    Each leg is compiled + warmed before timing (best of ``reps``).  A
    host-side profiling utility — three compiles per call — for tuning,
    not for production loops.
    """
    import dataclasses as _dc
    import time as _time

    batched = qp.P.ndim == 3
    qp_b = qp if batched else jax.tree.map(lambda a: a[None], qp)
    ws = warmstart
    if ws is not None and not batched:
        ws = jax.tree.map(lambda a: a[None], ws)

    def _best(fn, *args):
        out = fn(*args)  # compile + warm
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(reps):
            t0 = _time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            best = min(best, _time.perf_counter() - t0)
        return 1e3 * best, out

    fact = jax.jit(lambda q_: qp_factorize(q_, prm))
    prm_np = _dc.replace(prm, polish=False)
    solve_np = jax.jit(lambda q_, w_: _solve_qp_batch_impl(q_, prm_np, w_))
    factor_ms, _ = _best(fact, qp_b)
    nopolish_ms, sol = _best(solve_np, qp_b, ws)
    if prm.polish:
        solve_full = jax.jit(lambda q_, w_: _solve_qp_batch_impl(q_, prm, w_))
        total_ms, sol = _best(solve_full, qp_b, ws)
        polish_ms = max(0.0, total_ms - nopolish_ms)
    else:
        total_ms, polish_ms = nopolish_ms, 0.0
    return {
        "factor_ms": round(factor_ms, 4),
        "iterate_ms": round(max(0.0, nopolish_ms - factor_ms), 4),
        "polish_ms": round(polish_ms, 4),
        "total_ms": round(total_ms, 4),
        "iters_mean": float(jnp.mean(sol.iters)),
        "batch": int(qp_b.P.shape[0]),
    }
