"""Native SQP solver for nonlinear programs.

The reference delegates its collocation NLPs to Ipopt through a C++ adapter
(compat/ipopt.hpp); this framework ships a TPU-native solver instead: a
line-search SQP where

* derivatives (gradient, constraint Jacobian, Lagrangian Hessian) come from
  jax autodiff of the NLP's traceable callables,
* each subproblem is a dense QP solved by the batched ADMM kernel
  (warmstarted across SQP iterations),
* an adaptive Levenberg regularization keeps the Hessian ADMM-friendly,
* a fixed-grid backtracking line search on the l1 merit function picks the
  step inside the traced loop.

The entire solve is one ``lax.while_loop`` — it can run under jit and
``jax.vmap`` (fleets of NLPs in lockstep).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..nlp import NLP, NLPSolution, NLPSolutionStatus
from ..qp.solver import solve_qp_batch
from ..qp.types import QPSolution, QPSolutionStatus, QPSolverParams, QuadraticProgram
from ..utils.compensated import stationarity_compensated


@dataclasses.dataclass(frozen=True)
class SQPParams:
    max_iter: int = 100
    tol: float = 1e-6  # KKT inf-norm tolerance
    # adaptive_rho: the equality-augmented Hessians (aug_eq) condition the
    # subproblems; OSQP residual balancing cuts their ADMM iterations ~6x
    # (measured 9983 -> 1660 on the DI transcription)
    qp: QPSolverParams = dataclasses.field(
        default_factory=lambda: QPSolverParams(
            eps_abs=1e-9, eps_rel=1e-9, max_iter=4000, polish=True,
            adaptive_rho=True,
        )
    )
    reg_init: float = 1e-6
    reg_min: float = 1e-8
    reg_max: float = 1e8
    # Geometric-bisection steps refining the Hessian shift bracket; each
    # halves the bracket ratio (6 steps: x10 overshoot -> ~4%).
    reg_bisect: int = 6
    ls_steps: int = 16  # backtracking grid size (alpha = 0.5**k)
    armijo: float = 1e-4
    # Non-monotone (Grippo watchdog) line search: accept a step against the
    # MAX merit of the last ``nonmonotone_M`` iterates instead of the current
    # one.  This is the standard Maratos-effect remedy for an l1 merit: near
    # a solution the full SQP step often RAISES the merit by the constraint
    # curvature (second order) while the linear model predicts a tiny
    # decrease, so a monotone search truncates alpha to ~1e-3, the
    # regularization escalates, and convergence crawls (measured f32 stall
    # in the 1e-4..1e-2 band).  The watchdog lets the full Newton step
    # through; the M-window keeps it provably convergent.  1 = monotone.
    # The reference's Ipopt fills this role with its filter + second-order
    # corrections (compat/ipopt.hpp usage).
    nonmonotone_M: int = 4
    # Equality-row Hessian augmentation (0 disables).  The Lagrangian
    # Hessian of a collocation NLP is indefinite along equality-constraint
    # directions (measured on the DI transcription: lambda_min(H) = -0.13
    # while the equality-null-space reduced Hessian is PD), and convexifying
    # with a plain tau*I shift makes SQP converge LINEARLY at rate
    # ~ tau/(tau + curvature) — a measured 0.73/iteration tail.  Adding
    # c * A_E' A_E over the equality rows instead (the augmented-Lagrangian
    # Hessian) is EXACT: every QP-feasible step satisfies A_E d = r_E, so
    # the step is unchanged while H becomes PD for finite c (Debreu's
    # lemma, since the reduced Hessian is PD) — restoring true Newton steps
    # and quadratic convergence.  c escalates x10 until Cholesky succeeds
    # (warmstarted and decayed across iterations, like tau); tau remains as
    # the fallback for genuine reduced-space nonconvexity.  The known
    # multiplier shift lam_E' = lam_E - c (A_E d) is corrected after each
    # subproblem.  This replaces the role of Ipopt's indefinite LDLT
    # inertia correction (compat/ipopt.hpp:298), which an ADMM subproblem
    # solver (PSD P required) cannot use.  The value scales the STARTING
    # c relative to |H|/|G|; escalation finds the magnitude on its own.
    aug_eq: float = 1.0
    # Compensated (two-float) evaluation of the KKT stationarity residual
    # (utils/compensated.py).  The plain f32 einsum's accumulation error is
    # ~eps * m * |J||lam| (~1e-4..1e-2 on collocation NLPs), which both
    # floors the measured residual AND falsely triggers/misses the `done`
    # test; compensated accumulation restores f64-like accuracy from pure
    # f32 ops, so on-device certificates at tol 1e-4 and below are
    # trustworthy.  Fills the role of the reference's f64 NLP path
    # (compat/ipopt.hpp:298).  No-op cost in f64.
    compensated_kkt: bool = False
    verbose: bool = False  # per-iteration jax.debug.print of kkt/alpha/reg
    # Hessian mode: "exact" (Lagrangian Hessian by autodiff; fastest
    # convergence) or "bfgs" (damped BFGS; much lighter compile and
    # per-iteration cost — the analog of the reference example's Ipopt
    # hessian_approximation=limited-memory, ocp_se2_nlp.cpp:64).
    hessian: str = "exact"
    # Fleet chunking (solve_nlp_sqp_batch only; None = whole fleet in one
    # lockstep loop).  Cost per lockstep iteration is HBM-bandwidth-linear
    # in B while the iteration COUNT is the fleet max — and the expected
    # max over B random members grows with B, so one-shot throughput
    # ANTI-scales past B~64 (measured on the SE(2) OCP sweep: 63 solves/s
    # at B=64, 15.2 at B=256 — docs/TUNING.md "Fleet-size knee").  With
    # chunk_size set, the fleet runs as ceil(B/chunk) sequential chunks
    # through ONE compiled chunk-shaped program (lax.map): each chunk pays
    # only its own worst member, and compile cost stays at chunk size.
    chunk_size: Optional[int] = None
    # Per-member TOTAL inner-ADMM iteration budget (both forms;
    # None = unbounded).  A member whose subproblems keep hitting the
    # inner cap drags its whole lockstep group to the cap on EVERY SQP
    # iteration (measured: one pathological member burns 60 x ~1100 inner
    # iterations while its 63 chunk-mates sit frozen).  Exhausting the
    # budget freezes the member with IterationLimit — the rescue pass
    # (rescue_nonoptimal) then gives it a SOLO boosted solve where its
    # iterations tax nobody.  Set ~2x the p99 of converging members'
    # qp_iters (the SE(2) sweep: p99 ~34k -> budget 64k default off).
    qp_budget: Optional[int] = None
    # Difficulty probe for chunked fleets (batched form, chunk_size set,
    # no explicit sort_key): run `probe_iters` SQP iterations UNCHUNKED
    # with the inner-ADMM cap lowered to `probe_qp_cap` (cheap: the
    # fleet-wide lockstep pass is bounded by probe_iters x probe_qp_cap),
    # sort members by the observed difficulty (inner iterations + KKT
    # distance), then run the chunked solve warmstarted from the probe
    # state.  Stragglers cluster into FEW chunks instead of dragging every
    # chunk to their SQP iteration count; probe work is not wasted (the
    # main solve continues from the probe's primal-dual point) and is
    # included in the returned iters/qp_iters accounting.
    probe_iters: int = 0
    probe_qp_cap: int = 200
    # Stall freeze (both forms; None = off): a member whose KKT residual
    # has not dropped below ``stall_ratio x`` its last progress mark for
    # ``stall_iters`` consecutive SQP iterations freezes as
    # IterationLimit.  The qp_budget above bounds members burning INNER
    # iterations; this bounds the other straggler mode measured on the
    # SE(2) sweep: a diverging member whose subproblems are cheap (KKT
    # stuck at ~1e0 for 60 SQP iterations) dragging its lockstep group
    # through a transcription+factorization phase per iteration.  Frozen
    # members go to rescue_nonoptimal, where a diverging multistart
    # candidate now also stops after stall_iters instead of exhausting
    # its whole budget.  A ratio of 0.5 with stall_iters ~10 demands a
    # KKT halving per 10 iterations — far slower than any converging
    # SQP run observed on the sweeps (p99 converges in ~35 total).
    stall_iters: Optional[int] = None
    stall_ratio: float = 0.5


def _violation(nlp: NLP, x, gval):
    """Total l1 constraint + bound violation."""
    vg = jnp.sum(jnp.maximum(0.0, nlp.gl - gval) + jnp.maximum(0.0, gval - nlp.gu))
    vx = jnp.sum(jnp.maximum(0.0, nlp.xl - x) + jnp.maximum(0.0, x - nlp.xu))
    return vg + vx


def _zero_qp_ws(prefix: tuple, n: int, m: int, dt) -> QPSolution:
    """Zero inner-QP warmstart with the subproblem's (m + n dual) shapes."""
    return QPSolution(
        primal=jnp.zeros(prefix + (n,), dt),
        dual=jnp.zeros(prefix + (m + n,), dt),
        status=jnp.full(prefix, int(QPSolutionStatus.Unknown), jnp.int32),
        iters=jnp.zeros(prefix, jnp.int32),
        objective=jnp.zeros(prefix, dt),
        primal_res=jnp.full(prefix, jnp.asarray(jnp.inf, dt)),
        dual_res=jnp.full(prefix, jnp.asarray(jnp.inf, dt)),
    )


def solve_nlp_sqp(
    nlp: NLP,
    x0: jax.Array,
    params: SQPParams = SQPParams(),
    lam0: Optional[jax.Array] = None,
) -> NLPSolution:
    """Solve an NLP with line-search SQP; jit/vmap-compatible."""
    # TPU matmuls default to bf16 for f32 inputs; every derivative, KKT
    # residual, and Cholesky trial here must run at full precision or the
    # stationarity measure floors at bf16 resolution (~1e-2) and f32 solves
    # stall far above tol (the QP kernel already forces this internally).
    with jax.default_matmul_precision("highest"):
        return _solve_nlp_sqp_impl(nlp, x0, params, lam0)


def _solve_nlp_sqp_impl(
    nlp: NLP,
    x0: jax.Array,
    params: SQPParams,
    lam0: Optional[jax.Array],
) -> NLPSolution:
    n, m = nlp.n, nlp.m
    dt = x0.dtype
    inf = jnp.asarray(jnp.inf, dt)

    grad_f = jax.grad(nlp.f)
    jac_g = jax.jacrev(nlp.g)

    def lag_hess(x, lam):
        return jax.hessian(lambda xx: nlp.f(xx) + lam @ nlp.g(xx))(x)

    eyeN = jnp.eye(n, dtype=dt)
    alphas = 0.5 ** jnp.arange(params.ls_steps, dtype=dt)  # 1, 1/2, 1/4, ...

    # equality-row masks for the augmented-Lagrangian Hessian (l == u rows;
    # inf/nan bound differences compare False and stay inequalities)
    eq_g = ((nlp.gu - nlp.gl) <= 0.0).astype(dt)
    eq_x = ((nlp.xu - nlp.xl) <= 0.0).astype(dt)

    class _State(NamedTuple):
        it: jax.Array
        x: jax.Array
        lam: jax.Array
        z: jax.Array  # bound multipliers
        reg: jax.Array
        tau: jax.Array  # last Hessian convexification shift (exact mode)
        caug: jax.Array  # last equality-augmentation weight (exact mode)
        kkt: jax.Array
        done: jax.Array
        qp_iters: jax.Array  # accumulated inner-ADMM iterations
        qp_ws: QPSolution
        # stall freeze (SQPParams.stall_iters): last progress mark and the
        # count of consecutive iterations without stall_ratio progress
        kkt_mark: jax.Array
        stall_ct: jax.Array
        # cached evaluations at x (one derivative evaluation per iteration)
        fval: jax.Array
        gval: jax.Array
        grad: jax.Array
        J: jax.Array
        Hb: jax.Array  # BFGS Hessian approximation (identity in exact mode)
        # (objective, violation) ring buffers of the last M iterates for the
        # non-monotone line search (merit recombined with the CURRENT mu)
        fh: jax.Array  # (M,)
        vh: jax.Array  # (M,)

    def kkt_residual(x, lam, z, gval, grad, J):
        if params.compensated_kkt:
            stat = stationarity_compensated(grad, J, lam, z)
        else:
            stat = jnp.max(jnp.abs(grad + J.T @ lam + z))
        # feasibility
        vg = jnp.maximum(
            jnp.max(jnp.maximum(0.0, nlp.gl - gval), initial=0.0),
            jnp.max(jnp.maximum(0.0, gval - nlp.gu), initial=0.0),
        )
        vx = jnp.maximum(
            jnp.max(jnp.maximum(0.0, nlp.xl - x), initial=0.0),
            jnp.max(jnp.maximum(0.0, x - nlp.xu), initial=0.0),
        )
        return jnp.maximum(stat, jnp.maximum(vg, vx))

    def body(st: _State) -> _State:
        x, lam = st.x, st.lam
        fval, gval, grad, J = st.fval, st.gval, st.grad, st.J
        c_aug = jnp.zeros((), dt)
        if params.hessian == "exact":
            H = lag_hess(x, lam)
            H = 0.5 * (H + H.T)
            floor = jnp.maximum(jnp.asarray(params.reg_min, dt), st.reg)
            if params.aug_eq > 0.0:
                # exact equality-row augmentation (see SQPParams.aug_eq):
                # escalate c x10 until chol(H + c G + floor I) succeeds,
                # warmstarted from the previous iteration's c (decayed)
                G = (J * eq_g[:, None]).T @ J + jnp.diag(eq_x)
                gmax = jnp.max(jnp.abs(G))
                c_unit = (
                    params.aug_eq * (1.0 + jnp.max(jnp.abs(H))) / (1.0 + gmax)
                )
                # dtype-aware escalation cap: past cond(H + cG) ~ eps^-0.75
                # the Cholesky test fails from ROUNDOFF, not indefiniteness,
                # and a c that large poisons the ADMM subproblem anyway
                # (f32: ~2e5 * c_unit; f64: the previous 1e12 * c_unit).
                c_cap = c_unit / jnp.finfo(dt).eps ** 0.75
                c0 = jnp.clip(st.caug / 10.0, c_unit, c_cap)

                def _ok_c(c):
                    L = jnp.linalg.cholesky(H + c * G + floor * eyeN)
                    return jnp.isfinite(L).all()

                def _c_cond(cc):
                    c, ok = cc
                    # no equality rows -> c cannot help; fall through to tau
                    return jnp.logical_and(
                        jnp.logical_not(ok),
                        jnp.logical_and(c < c_cap, gmax > 0.0),
                    )

                def _c_body(cc):
                    c, _ = cc
                    cn = 10.0 * c
                    return cn, _ok_c(cn)

                c_hi, c_ok = lax.while_loop(_c_cond, _c_body, (c0, _ok_c(c0)))

                # refine toward the minimal PD-making c: overshooting c is
                # still exact, but it conditions the QP subproblem (measured:
                # a x10-overshot c drove the inner ADMM into its iteration
                # cap), so the bracket is bisected like tau's
                def _c_bis(_, cc):
                    lo, hi = cc
                    mid = jnp.sqrt(lo * hi)
                    ok = _ok_c(mid)
                    return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

                _, c_aug = lax.fori_loop(
                    0, params.reg_bisect, _c_bis, (c_hi / 10.0, c_hi)
                )
                # escalation exhausted without a PD Cholesky: augmentation
                # cannot help (or roundoff defeats the test at this
                # precision) — give up on it entirely and let the tau shift
                # below convexify.  (Using the cap value here instead was a
                # measured f32 catastrophe: H += 2e5 * c_unit * G made every
                # subproblem unsolvable and the f32 sweep diverged to NaN.)
                c_aug = jnp.where(c_ok, c_aug, jnp.zeros_like(c_hi))
                # Augmentation requires SOLVABLE subproblems: its multiplier
                # reconstruction (lam' = lam_aug + c A_E d) amplifies the
                # subproblem's dual error by c, so while the inner ADMM is
                # iteration-capped (the f32 tight-eps regime) augmentation
                # self-disables and the tau shift carries the convexification;
                # it re-engages as soon as the member's subproblems converge
                # again.
                prev_capped = st.qp_ws.status == QPSolutionStatus.MaxIterations
                c_aug = jnp.where(prev_capped, jnp.zeros_like(c_aug), c_aug)
                H = H + c_aug * G
            # Convexify with a shifted-Cholesky trial loop (the role of
            # Ipopt's inertia correction, compat/ipopt.hpp:298-338 path): try
            # chol(H + tau I) for tau escalating x10 until it succeeds, then
            # refine the bracket with a few geometric bisections — the final
            # shift is within ~4% of the smallest PD-making shift.  The
            # minimal shift matters: when the Lagrangian Hessian is indefinite
            # at the solution (common for collocation NLPs — the quadrature
            # consistency row carries negative curvature), SQP converges
            # linearly at rate ~ tau/(tau + curvature), so a x10 overshoot
            # multiplies the iteration count several-fold.  tau warm-starts
            # from the previous iteration (decayed, so PSD problems anneal to
            # reg_min and recover quadratic convergence).  Total cost is
            # ~(1 + escalations + reg_bisect) n^3/3 Choleskys — still far
            # below the eigendecomposition this replaces (round-1 weak #5).
            def _chol_ok(tau):
                L = jnp.linalg.cholesky(H + tau * eyeN)
                return jnp.isfinite(L).all()

            # st.reg is the Levenberg floor: it escalates when steps are
            # rejected (e.g. a singular-Hessian QP whose unbounded directions
            # produce unusable steps) and decays on success, so tau can only
            # anneal toward the minimal PD shift while the line search is
            # accepting steps.
            tau0 = jnp.maximum(st.tau / 10.0, floor)

            def _esc_cond(c):
                tau, ok = c
                return jnp.logical_and(jnp.logical_not(ok), tau < params.reg_max)

            def _esc_body(c):
                tau, _ = c
                tau_next = 10.0 * tau
                return tau_next, _chol_ok(tau_next)

            tau_hi, _ = lax.while_loop(
                _esc_cond, _esc_body, (tau0, _chol_ok(tau0))
            )

            def _bis_body(_, c):
                lo, hi = c
                mid = jnp.sqrt(lo * hi)
                ok = _chol_ok(mid)
                return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

            _, tau = lax.fori_loop(
                0, params.reg_bisect, _bis_body, (tau_hi / 10.0, tau_hi)
            )
            tau = jnp.maximum(tau, floor)
            H = H + tau * eyeN
        else:
            tau = st.tau
            H = st.Hb + st.reg * eyeN

        # QP subproblem in the step d
        A = jnp.concatenate([J, eyeN], axis=0)
        lqp = jnp.concatenate([nlp.gl - gval, nlp.xl - x])
        uqp = jnp.concatenate([nlp.gu - gval, nlp.xu - x])
        qp = QuadraticProgram(P=H, q=grad, A=A, l=lqp, u=uqp)
        qp_b = jax.tree.map(lambda a: a[None], qp)
        ws_b = jax.tree.map(lambda a: a[None], st.qp_ws)
        sol = jax.tree.map(
            lambda a: a[0], solve_qp_batch(qp_b, params.qp, ws_b)
        )
        d = sol.primal
        # sanitize: a diverged subproblem must not poison the multiplier
        # blends below (0 * nan = nan even at alpha = 0)
        lam_qp = jnp.where(jnp.isfinite(sol.dual[:m]), sol.dual[:m], 0.0)
        z_qp = jnp.where(jnp.isfinite(sol.dual[m:]), sol.dual[m:], 0.0)
        # Accept Optimal / PolishFailed, and also MaxIterations iterates: an
        # unconverged ADMM iterate is usually still a descent direction (f32
        # subproblems near tight tolerances often cap out), and the merit
        # line search below rejects it if not.  Only infeasibility
        # certificates and non-finite solutions zero the step.
        qp_ok = jnp.logical_and(
            jnp.logical_or(
                sol.status == QPSolutionStatus.Optimal,
                jnp.logical_or(
                    sol.status == QPSolutionStatus.PolishFailed,
                    sol.status == QPSolutionStatus.MaxIterations,
                ),
            ),
            jnp.isfinite(d).all(),
        )
        d = jnp.where(qp_ok, d, jnp.zeros_like(d))
        # undo the augmentation's known multiplier shift (lam' = lam - c A_E d)
        lam_qp = lam_qp + c_aug * eq_g * (J @ d)
        z_qp = z_qp + c_aug * eq_x * d
        # The shift identity only holds at the subproblem's SOLUTION: with an
        # unconverged ADMM iterate the dual error is amplified by c_aug, and
        # |H| grows with |lam|, inflating next iteration's c — a measured f32
        # runaway (lam 1e3 -> 1e14 -> NaN in 3 iterations when every inner QP
        # hits its iteration cap).  An unconverged iterate is still a usable
        # DESCENT DIRECTION, but under augmentation its dual is not a usable
        # multiplier estimate — keep the previous multipliers then.
        dual_ok = jnp.logical_or(
            jnp.logical_or(
                sol.status == QPSolutionStatus.Optimal,
                sol.status == QPSolutionStatus.PolishFailed,
            ),
            c_aug <= 0.0,
        )
        lam_qp = jnp.where(dual_ok, lam_qp, lam)
        z_qp = jnp.where(dual_ok, z_qp, st.z)

        # l1 merit line search on a fixed alpha grid
        mu = 2.0 * jnp.max(jnp.abs(lam_qp), initial=1.0) + 1.0
        viol0 = _violation(nlp, x, gval)
        phi0 = fval + mu * viol0
        # directional derivative (upper bound): grad'd - mu*viol0
        dd = grad @ d - mu * viol0

        def merit(alpha):
            xa = x + alpha * d
            return nlp.f(xa) + mu * _violation(nlp, xa, nlp.g(xa))

        phis = jax.vmap(merit)(alphas)
        # non-finite merit (overflowing trial points) must never be selected
        phis = jnp.where(jnp.isfinite(phis), phis, inf)
        # Relative merit tolerance: near a solution the true merit decrease is
        # below floating-point resolution of phi (in f32: |phi| ~ 1, decrease
        # ~ 1e-8), so an exact Armijo test rejects every step and the solver
        # stalls with alpha = 0.  Accepting eps-level ties is the standard
        # approximate-descent remedy; in f64 the slack is ~1e-15 |phi| and
        # changes nothing.
        eps_m = 10.0 * jnp.finfo(dt).eps * (1.0 + jnp.abs(phi0))
        # watchdog reference: max merit over the last M accepted iterates
        # (see SQPParams.nonmonotone_M), recombined with the current mu
        phi_ref = jnp.maximum(jnp.max(st.fh + mu * st.vh), phi0)
        armijo_ok = phis <= phi_ref + params.armijo * alphas * dd + eps_m
        any_ok = jnp.any(armijo_ok)
        first_ok = jnp.argmax(armijo_ok)  # first True (alphas descending)
        best = jnp.argmin(phis)
        pick = jnp.where(any_ok, first_ok, best)
        alpha = jnp.where(
            jnp.logical_and(qp_ok, jnp.logical_or(any_ok, phis[best] < phi_ref)),
            alphas[pick],
            jnp.zeros((), dt),
        )

        x_new = x + alpha * d
        # Multiplier update: when the subproblem CONVERGED, take the full
        # dual step (Han-Powell) regardless of the primal alpha — lam_qp is
        # the valid multiplier estimate at x, and gating it by alpha was a
        # measured f32 stall: near a solution the merit line search picks
        # alpha ~ 1e-3 (the true decrease is below evaluation noise), the
        # blend freezes lam, stationarity never drops, and reg escalation
        # shrinks the steps further.  The alpha blend remains the damped
        # fallback for unconverged (iteration-capped) subproblem duals.
        dual_full = jnp.logical_or(
            sol.status == QPSolutionStatus.Optimal,
            sol.status == QPSolutionStatus.PolishFailed,
        )
        lam_new = jnp.where(
            dual_full, lam_qp, (1 - alpha) * lam + alpha * lam_qp
        )
        z_new = jnp.where(
            dual_full, z_qp, (1 - alpha) * st.z + alpha * z_qp
        )

        # adapt regularization
        reg = jnp.where(
            alpha >= 0.5,
            jnp.maximum(st.reg / 10.0, params.reg_min),
            jnp.where(
                alpha <= 1e-3,
                jnp.minimum(st.reg * 10.0 + 1e-6, params.reg_max),
                st.reg,
            ),
        )

        # single derivative evaluation at the new iterate (reused next round)
        f_new = nlp.f(x_new)
        g_new = nlp.g(x_new)
        grad_new = grad_f(x_new)
        J_new = jac_g(x_new)
        kkt = kkt_residual(x_new, lam_new, z_new, g_new, grad_new, J_new)
        done = kkt <= params.tol

        if params.stall_iters is not None:
            prog = kkt < st.kkt_mark * params.stall_ratio
            kkt_mark = jnp.where(prog, kkt, st.kkt_mark)
            stall_ct = jnp.where(prog, jnp.int32(0), st.stall_ct + 1)
        else:
            kkt_mark, stall_ct = st.kkt_mark, st.stall_ct

        if params.hessian == "bfgs":
            # damped (Powell) BFGS on the Lagrangian gradient
            s_v = x_new - x
            y_v = (grad_new + J_new.T @ lam_new) - (grad + J.T @ lam_new)
            Hb = st.Hb
            Hs = Hb @ s_v
            sHs = s_v @ Hs
            sy = s_v @ y_v
            ok_upd = jnp.logical_and(alpha > 0, sHs > 1e-12)
            theta = jnp.where(
                sy >= 0.2 * sHs, 1.0, 0.8 * sHs / jnp.maximum(sHs - sy, 1e-12)
            )
            y_t = theta * y_v + (1 - theta) * Hs
            sty = jnp.maximum(s_v @ y_t, 1e-12)
            Hb_new = (
                Hb
                - jnp.outer(Hs, Hs) / jnp.maximum(sHs, 1e-12)
                + jnp.outer(y_t, y_t) / sty
            )
            Hb_new = 0.5 * (Hb_new + Hb_new.T)
            Hb = jnp.where(ok_upd, Hb_new, Hb)
        else:
            Hb = st.Hb

        if params.verbose:
            jax.debug.print(
                "[sqp] it {i}: kkt {k:.3e} alpha {a:.3f} reg {r:.1e} "
                "obj {o:.6e} qp_status {s}",
                i=st.it,
                k=kkt,
                a=alpha,
                r=st.reg,
                o=f_new,
                s=sol.status,
            )
        return _State(
            it=st.it + 1,
            x=x_new,
            lam=lam_new,
            z=z_new,
            reg=reg,
            tau=tau,
            caug=c_aug,
            kkt=kkt,
            done=done,
            qp_iters=st.qp_iters + sol.iters,
            qp_ws=sol,
            kkt_mark=kkt_mark,
            stall_ct=stall_ct,
            fval=f_new,
            gval=g_new,
            grad=grad_new,
            J=J_new,
            Hb=Hb,
            fh=jnp.concatenate([st.fh[1:], f_new[None]]),
            vh=jnp.concatenate(
                [st.vh[1:], _violation(nlp, x_new, g_new)[None]]
            ),
        )

    def cond(st: _State):
        run = jnp.logical_and(st.it < params.max_iter, jnp.logical_not(st.done))
        if params.qp_budget is not None:
            # total inner-ADMM budget (same rule as the batched form): a
            # diverging solve must not burn max_iter x qp.max_iter inner
            # iterations — it exits IterationLimit and the caller (e.g.
            # rescue_nonoptimal's multistart stage) tries a different start
            run = jnp.logical_and(run, st.qp_iters < params.qp_budget)
        if params.stall_iters is not None:
            # no stall_ratio KKT progress for stall_iters consecutive
            # iterations: exit IterationLimit (same rule as the batched
            # form's per-member freeze)
            run = jnp.logical_and(run, st.stall_ct < params.stall_iters)
        return run

    lam_init = jnp.zeros((m,), dt) if lam0 is None else lam0
    ws0 = _zero_qp_ws((), n, m, dt)
    x0 = jnp.asarray(x0, dt)
    st0 = _State(
        it=jnp.int32(0),
        x=x0,
        lam=lam_init,
        z=jnp.zeros((n,), dt),
        reg=jnp.asarray(params.reg_init, dt),
        tau=jnp.asarray(params.reg_init, dt),
        caug=jnp.zeros((), dt),
        kkt=inf,
        done=jnp.asarray(False),
        qp_iters=jnp.asarray(0, jnp.int32),
        qp_ws=ws0,
        kkt_mark=inf,
        stall_ct=jnp.asarray(0, jnp.int32),
        fval=nlp.f(x0),
        gval=nlp.g(x0),
        grad=grad_f(x0),
        J=jac_g(x0),
        Hb=eyeN,
        fh=jnp.full((max(1, params.nonmonotone_M),), nlp.f(x0), dt),
        vh=jnp.full(
            (max(1, params.nonmonotone_M),),
            _violation(nlp, x0, nlp.g(x0)),
            dt,
        ),
    )
    st = lax.while_loop(cond, body, st0)

    status = jnp.where(
        st.done, int(NLPSolutionStatus.Optimal), int(NLPSolutionStatus.IterationLimit)
    ).astype(jnp.int32)
    return NLPSolution(
        status=status,
        iters=st.it,
        x=st.x,
        zl=jnp.maximum(-st.z, 0.0),
        zu=jnp.maximum(st.z, 0.0),
        lam=st.lam,
        objective=nlp.f(st.x),
        kkt_res=st.kkt,
        qp_iters=st.qp_iters,
    )


# --------------------------------------------------- natively batched solver
#
# ``jax.vmap(solve_nlp_sqp)`` works, but it is the WRONG program for a TPU
# fleet: vmap lowers every ``lax.cond`` in the solver (and in the inner QP's
# iteration loop) to a both-branches ``select`` and removes all early exits,
# so each fleet member pays every other member's iteration budget AND the
# periodic-branch costs become per-iteration costs (measured: adaptive-rho
# refactorization under vmap runs every ADMM iteration instead of every
# stopping check, 4x slower despite 8x fewer iterations).  Deeply nested
# vmapped while_loops are also a measured TPU fault mode.
#
# ``solve_nlp_sqp_batch`` instead batches natively, the same way the QP
# solver does (one scalar while_loop driving (B, ...) state with
# mask-and-continue), and solves the SQP subproblems with a single direct
# ``solve_qp_batch`` call — whose own scalar loop keeps real branches, real
# early exit, and cheap adaptive rho.


def solve_nlp_sqp_batch(
    make_nlp,
    thetas,
    x0: jax.Array,
    params: SQPParams = SQPParams(),
    lam0: Optional[jax.Array] = None,
    sort_key: Optional[jax.Array] = None,
) -> NLPSolution:
    """Solve a fleet of structurally identical NLPs in one batched SQP.

    ``make_nlp(theta) -> NLP`` must be jax-traceable in ``theta`` (a pytree
    whose leaves carry a leading batch axis B — problem data such as tracked
    velocities or boundary conditions); every member shares (n, m).  ``x0``
    is (B, n).  Returns an :class:`NLPSolution` with a leading batch axis.

    Prefer this over ``jax.vmap(solve_nlp_sqp)`` for fleets (see module
    comment); parity-tested against the vmapped form.

    With ``params.chunk_size`` set the fleet executes as sequential chunks
    (one compiled chunk-shaped program; docs/TUNING.md "Fleet-size knee"),
    and an optional ``sort_key`` (B,) — e.g. the previous refinement pass's
    per-member ``qp_iters`` — orders members by expected difficulty so
    stragglers cluster into FEW chunks instead of taxing every chunk's
    lockstep loop (cf. the pallas QP backend's ``sort_stragglers``).
    Results are inverse-permuted; exact up to chunk-membership effects on
    the shared early-exit tests.
    """
    with jax.default_matmul_precision("highest"):
        cs = params.chunk_size
        B = x0.shape[0]
        if cs is None or B <= cs:
            return _solve_nlp_sqp_batch_impl(make_nlp, thetas, x0, params, lam0)

        if lam0 is None:
            m = make_nlp(jax.tree.map(lambda a: a[0], thetas)).m
            lam0 = jnp.zeros((B, m), x0.dtype)

        probe = None
        if params.probe_iters > 0 and sort_key is None:
            # cheap fleet-wide difficulty probe (see SQPParams.probe_iters)
            probe_prm = dataclasses.replace(
                params,
                max_iter=params.probe_iters,
                probe_iters=0,
                chunk_size=None,
                qp=dataclasses.replace(
                    params.qp,
                    max_iter=min(params.qp.max_iter, params.probe_qp_cap),
                ),
            )
            probe = _solve_nlp_sqp_batch_impl(
                make_nlp, thetas, x0, probe_prm, lam0
            )
            # primary: observed inner iterations; tiebreak (members that
            # saturate the probe cap): log-distance of the KKT residual
            # from tol — the pathological members sit orders of magnitude
            # out
            sort_key = probe.qp_iters.astype(x0.dtype) + 10.0 * jnp.clip(
                jnp.log10(jnp.maximum(probe.kkt_res, 1e-12) / params.tol),
                0.0,
                30.0,
            )
            x0, lam0 = probe.x, probe.lam

        perm = None
        if sort_key is not None:
            perm = jnp.argsort(sort_key)
            thetas = jax.tree.map(lambda a: a[perm], thetas)
            x0, lam0 = x0[perm], lam0[perm]

        n_chunks = -(-B // cs)
        pad = n_chunks * cs - B

        def _chunk(a):
            if pad:
                a = jnp.concatenate(
                    [a, jnp.broadcast_to(a[:1], (pad,) + a.shape[1:])]
                )
            return a.reshape((n_chunks, cs) + a.shape[1:])

        sol_c = lax.map(
            lambda args: _solve_nlp_sqp_batch_impl(
                make_nlp, args[0], args[1], params, args[2]
            ),
            (jax.tree.map(_chunk, thetas), _chunk(x0), _chunk(lam0)),
        )
        sol = jax.tree.map(
            lambda a: a.reshape((n_chunks * cs,) + a.shape[2:])[:B], sol_c
        )
        if perm is not None:
            inv = jnp.argsort(perm)
            sol = jax.tree.map(lambda a: a[inv], sol)
        if probe is not None:
            # honest work accounting: the probe's iterations are real solve
            # work the main pass continued from
            sol = sol._replace(
                iters=sol.iters + probe.iters,
                qp_iters=sol.qp_iters + probe.qp_iters,
            )
        return sol


def _solve_nlp_sqp_batch_impl(make_nlp, thetas, x0, params, lam0):
    th0 = jax.tree.map(lambda a: a[0], thetas)
    nlp0 = make_nlp(th0)
    n, m = nlp0.n, nlp0.m
    B = x0.shape[0]
    dt = x0.dtype
    inf = jnp.asarray(jnp.inf, dt)

    # batched evaluation of the per-member callables (each vmap re-traces
    # make_nlp; trace-time cost only)
    fB = jax.vmap(lambda th, x: make_nlp(th).f(x))
    gB = jax.vmap(lambda th, x: make_nlp(th).g(x))
    gradB = jax.vmap(lambda th, x: jax.grad(lambda xx: make_nlp(th).f(xx))(x))
    JB = jax.vmap(lambda th, x: jax.jacrev(lambda xx: make_nlp(th).g(xx))(x))
    hessB = jax.vmap(
        lambda th, x, lam: jax.hessian(
            lambda xx: make_nlp(th).f(xx) + lam @ make_nlp(th).g(xx)
        )(x)
    )
    xl, xu, gl, gu = jax.vmap(
        lambda th: (make_nlp(th).xl, make_nlp(th).xu, make_nlp(th).gl, make_nlp(th).gu)
    )(thetas)  # (B, n) x2, (B, m) x2

    eyeN = jnp.eye(n, dtype=dt)
    eyeN_b = jnp.broadcast_to(eyeN, (B, n, n))
    alphas = 0.5 ** jnp.arange(params.ls_steps, dtype=dt)

    # per-element equality-row masks (cf. the single-problem form)
    eq_g = ((gu - gl) <= 0.0).astype(dt)  # (B, m)
    eq_x = ((xu - xl) <= 0.0).astype(dt)  # (B, n)

    def _violation_b(x, gval):
        vg = jnp.sum(
            jnp.maximum(0.0, gl - gval) + jnp.maximum(0.0, gval - gu), axis=1
        )
        vx = jnp.sum(jnp.maximum(0.0, xl - x) + jnp.maximum(0.0, x - xu), axis=1)
        return vg + vx

    def kkt_residual_b(x, lam, z, gval, grad, J):
        if params.compensated_kkt:
            stat = stationarity_compensated(grad, J, lam, z)
        else:
            stat = jnp.max(
                jnp.abs(grad + jnp.einsum("bmn,bm->bn", J, lam) + z), axis=1
            )
        vg = jnp.max(
            jnp.maximum(
                jnp.maximum(0.0, gl - gval), jnp.maximum(0.0, gval - gu)
            ),
            axis=1,
            initial=0.0,
        )
        vx = jnp.max(
            jnp.maximum(jnp.maximum(0.0, xl - x), jnp.maximum(0.0, x - xu)),
            axis=1,
            initial=0.0,
        )
        return jnp.maximum(stat, jnp.maximum(vg, vx))

    class _BState(NamedTuple):
        it: jax.Array  # scalar loop counter
        x: jax.Array  # (B, n)
        lam: jax.Array  # (B, m)
        z: jax.Array  # (B, n)
        reg: jax.Array  # (B,)
        tau: jax.Array  # (B,)
        caug: jax.Array  # (B,) equality-augmentation weight (exact mode)
        kkt: jax.Array  # (B,)
        done: jax.Array  # (B,) bool
        # (B,) bool: frozen by qp_budget exhaustion or stall (done but NOT
        # Optimal; the rescue pass re-solves these solo)
        failed: jax.Array
        iters: jax.Array  # (B,) int32: SQP iterations until convergence
        qp_iters: jax.Array  # (B,) int32: accumulated inner-ADMM iterations
        # (B,) stall freeze state (SQPParams.stall_iters): last progress
        # mark and consecutive no-progress iteration count
        kkt_mark: jax.Array
        stall_ct: jax.Array
        qp_ws: QPSolution  # batched warmstart
        fval: jax.Array  # (B,)
        gval: jax.Array  # (B, m)
        grad: jax.Array  # (B, n)
        J: jax.Array  # (B, m, n)
        Hb: jax.Array  # (B, n, n) BFGS approximation (identity in exact mode)
        fh: jax.Array  # (B, M) objective ring buffer (watchdog line search)
        vh: jax.Array  # (B, M) violation ring buffer

    def _chol_ok_b(H, tau):
        L = jnp.linalg.cholesky(H + tau[:, None, None] * eyeN)
        return jnp.isfinite(L).all(axis=(1, 2))

    def body(st: _BState) -> _BState:
        run = jnp.logical_not(st.done)
        x, lam = st.x, st.lam
        fval, gval, grad, J = st.fval, st.gval, st.grad, st.J

        c_aug = jnp.zeros((B,), dt)
        if params.hessian == "exact":
            H = hessB(thetas, x, lam)
            H = 0.5 * (H + jnp.swapaxes(H, 1, 2))
            floor = jnp.maximum(jnp.asarray(params.reg_min, dt), st.reg)
            if params.aug_eq > 0.0:
                # exact equality-row augmentation (cf. the single-problem
                # form): scalar-driven escalation loop with per-element c
                G = jnp.einsum("bmi,bm,bmj->bij", J, eq_g, J)
                G = G + eq_x[:, :, None] * eyeN
                gmax = jnp.max(jnp.abs(G), axis=(1, 2))
                c_unit = (
                    params.aug_eq
                    * (1.0 + jnp.max(jnp.abs(H), axis=(1, 2)))
                    / (1.0 + gmax)
                )
                # dtype-aware escalation cap, same rule as the single-problem
                # form above: past cond(H + cG) ~ eps^-0.75 the Cholesky test
                # fails from ROUNDOFF, not indefiniteness, and in f32 the old
                # 1e12 cap let the escalation loop spin ~17 futile x10 rounds
                # of batched Choleskys per SQP iteration before the c_ok
                # gating discarded the result anyway.
                c_cap = c_unit / jnp.finfo(dt).eps ** 0.75
                c0 = jnp.clip(st.caug / 10.0, c_unit, c_cap)

                def _ok_c_b(c):
                    L = jnp.linalg.cholesky(
                        H + c[:, None, None] * G + floor[:, None, None] * eyeN
                    )
                    return jnp.isfinite(L).all(axis=(1, 2))

                def _c_cond(cc):
                    c, ok = cc
                    return jnp.logical_and(
                        jnp.logical_not(ok),
                        jnp.logical_and(c < c_cap, gmax > 0.0),
                    ).any()

                def _c_body(cc):
                    c, ok = cc
                    cn = jnp.where(ok, c, 10.0 * c)
                    ok_n = jnp.where(ok, ok, _ok_c_b(cn))
                    return cn, ok_n

                c_hi, c_ok = lax.while_loop(_c_cond, _c_body, (c0, _ok_c_b(c0)))

                # bisect toward the minimal PD-making c (cf. single form):
                # an overshot c conditions the inner ADMM subproblems
                def _c_bis(_, cc):
                    lo, hi = cc
                    mid = jnp.sqrt(lo * hi)
                    ok = _ok_c_b(mid)
                    return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

                _, c_aug = lax.fori_loop(
                    0, params.reg_bisect, _c_bis, (c_hi / 10.0, c_hi)
                )
                # fall back to the tau shift when escalation never succeeded,
                # and self-disable while the member's subproblems are
                # iteration-capped (see the single-problem form)
                c_aug = jnp.where(c_ok, c_aug, jnp.zeros_like(c_hi))
                prev_capped = st.qp_ws.status == QPSolutionStatus.MaxIterations
                c_aug = jnp.where(prev_capped, jnp.zeros_like(c_aug), c_aug)
                H = H + c_aug[:, None, None] * G
            # per-element shifted-Cholesky convexification (cf. the single-
            # problem form above): escalate tau x10 until chol succeeds, then
            # geometric bisection.  The escalation while_loop is scalar-
            # driven (runs while ANY element still fails) with per-element
            # masking, so the fleet pays max-escalations batched Choleskys.
            tau0 = jnp.maximum(st.tau / 10.0, floor)

            def _esc_cond(c):
                tau, ok = c
                return jnp.logical_and(
                    jnp.logical_not(ok), tau < params.reg_max
                ).any()

            def _esc_body(c):
                tau, ok = c
                tau_n = jnp.where(ok, tau, 10.0 * tau)
                ok_n = jnp.where(ok, ok, _chol_ok_b(H, tau_n))
                return tau_n, ok_n

            tau_hi, _ = lax.while_loop(
                _esc_cond, _esc_body, (tau0, _chol_ok_b(H, tau0))
            )

            def _bis_body(_, c):
                lo, hi = c
                mid = jnp.sqrt(lo * hi)
                ok = _chol_ok_b(H, mid)
                return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

            _, tau = lax.fori_loop(
                0, params.reg_bisect, _bis_body, (tau_hi / 10.0, tau_hi)
            )
            tau = jnp.maximum(tau, floor)
            H = H + tau[:, None, None] * eyeN
        else:
            tau = st.tau
            H = st.Hb + st.reg[:, None, None] * eyeN

        # one direct batched QP subproblem solve: scalar inner loop, real
        # periodic-check branches, per-element early freeze + global early
        # exit — none of which survive under vmap(solve_nlp_sqp)
        A = jnp.concatenate([J, eyeN_b], axis=1)
        lqp = jnp.concatenate([gl - gval, xl - x], axis=1)
        uqp = jnp.concatenate([gu - gval, xu - x], axis=1)
        qp_b = QuadraticProgram(P=H, q=grad, A=A, l=lqp, u=uqp)
        sol = solve_qp_batch(qp_b, params.qp, st.qp_ws)
        d = sol.primal
        lam_qp = jnp.where(jnp.isfinite(sol.dual[:, :m]), sol.dual[:, :m], 0.0)
        z_qp = jnp.where(jnp.isfinite(sol.dual[:, m:]), sol.dual[:, m:], 0.0)
        qp_ok = jnp.logical_and(
            jnp.logical_or(
                sol.status == QPSolutionStatus.Optimal,
                jnp.logical_or(
                    sol.status == QPSolutionStatus.PolishFailed,
                    sol.status == QPSolutionStatus.MaxIterations,
                ),
            ),
            jnp.isfinite(d).all(axis=1),
        )
        d = jnp.where(qp_ok[:, None], d, 0.0)
        # undo the augmentation's known multiplier shift (lam' = lam - c A_E d)
        lam_qp = lam_qp + c_aug[:, None] * eq_g * jnp.einsum("bmn,bn->bm", J, d)
        z_qp = z_qp + c_aug[:, None] * eq_x * d
        # unconverged subproblem + augmentation -> dual estimate amplified by
        # c_aug is garbage; keep the previous multipliers (see single form)
        dual_ok = jnp.logical_or(
            jnp.logical_or(
                sol.status == QPSolutionStatus.Optimal,
                sol.status == QPSolutionStatus.PolishFailed,
            ),
            c_aug <= 0.0,
        )
        lam_qp = jnp.where(dual_ok[:, None], lam_qp, lam)
        z_qp = jnp.where(dual_ok[:, None], z_qp, st.z)

        # l1 merit line search on the shared alpha grid, per element
        mu = 2.0 * jnp.max(jnp.abs(lam_qp), axis=1, initial=1.0) + 1.0
        viol0 = _violation_b(x, gval)
        phi0 = fval + mu * viol0
        dd = jnp.einsum("bn,bn->b", grad, d) - mu * viol0

        def merit(alpha):
            xa = x + alpha * d
            return fB(thetas, xa) + mu * _violation_b(xa, gB(thetas, xa))

        phis = jax.vmap(merit)(alphas)  # (L, B)
        phis = jnp.where(jnp.isfinite(phis), phis, inf)
        eps_m = 10.0 * jnp.finfo(dt).eps * (1.0 + jnp.abs(phi0))
        # watchdog reference merit (cf. single form)
        phi_ref = jnp.maximum(
            jnp.max(st.fh + mu[:, None] * st.vh, axis=1), phi0
        )
        armijo_ok = (
            phis <= phi_ref + params.armijo * alphas[:, None] * dd + eps_m
        )
        any_ok = jnp.any(armijo_ok, axis=0)
        first_ok = jnp.argmax(armijo_ok, axis=0)
        best = jnp.argmin(phis, axis=0)
        pick = jnp.where(any_ok, first_ok, best)
        phi_best = jnp.take_along_axis(phis, best[None, :], axis=0)[0]
        alpha = jnp.where(
            jnp.logical_and(qp_ok, jnp.logical_or(any_ok, phi_best < phi_ref)),
            alphas[pick],
            jnp.zeros((B,), dt),
        )

        x_new = x + alpha[:, None] * d
        # full dual step for converged subproblems (Han-Powell; see the
        # single-problem form for the measured f32 stall this fixes)
        dual_full = jnp.logical_or(
            sol.status == QPSolutionStatus.Optimal,
            sol.status == QPSolutionStatus.PolishFailed,
        )[:, None]
        lam_new = jnp.where(
            dual_full, lam_qp, (1 - alpha[:, None]) * lam + alpha[:, None] * lam_qp
        )
        z_new = jnp.where(
            dual_full, z_qp, (1 - alpha[:, None]) * st.z + alpha[:, None] * z_qp
        )

        reg = jnp.where(
            alpha >= 0.5,
            jnp.maximum(st.reg / 10.0, params.reg_min),
            jnp.where(
                alpha <= 1e-3,
                jnp.minimum(st.reg * 10.0 + 1e-6, params.reg_max),
                st.reg,
            ),
        )

        f_new = fB(thetas, x_new)
        g_new = gB(thetas, x_new)
        grad_new = gradB(thetas, x_new)
        J_new = JB(thetas, x_new)
        kkt = kkt_residual_b(x_new, lam_new, z_new, g_new, grad_new, J_new)
        done_new = kkt <= params.tol

        if params.hessian == "bfgs":
            s_v = x_new - x
            y_v = (
                grad_new + jnp.einsum("bmn,bm->bn", J_new, lam_new)
            ) - (grad + jnp.einsum("bmn,bm->bn", J, lam_new))
            Hb = st.Hb
            Hs = jnp.einsum("bij,bj->bi", Hb, s_v)
            sHs = jnp.einsum("bn,bn->b", s_v, Hs)
            sy = jnp.einsum("bn,bn->b", s_v, y_v)
            ok_upd = jnp.logical_and(alpha > 0, sHs > 1e-12)
            theta = jnp.where(
                sy >= 0.2 * sHs,
                1.0,
                0.8 * sHs / jnp.maximum(sHs - sy, 1e-12),
            )
            y_t = theta[:, None] * y_v + (1 - theta)[:, None] * Hs
            sty = jnp.maximum(jnp.einsum("bn,bn->b", s_v, y_t), 1e-12)
            Hb_new = (
                Hb
                - Hs[:, :, None] * Hs[:, None, :] / jnp.maximum(sHs, 1e-12)[:, None, None]
                + y_t[:, :, None] * y_t[:, None, :] / sty[:, None, None]
            )
            Hb_new = 0.5 * (Hb_new + jnp.swapaxes(Hb_new, 1, 2))
            Hb = jnp.where(ok_upd[:, None, None], Hb_new, Hb)
        else:
            Hb = st.Hb

        if params.verbose:
            jax.debug.print(
                "[sqp/batch] it {i}: running {r}/{b} kkt med {km:.3e} "
                "max {kx:.3e} qp_iters max {q} qp_st max {qs} "
                "c_aug max {c:.2e} tau max {t:.2e} alpha med {a:.3f} "
                "|lam_qp| max {l:.2e} |d| max {dn:.2e}",
                i=st.it, r=jnp.sum(run), b=B,
                km=jnp.median(kkt), kx=jnp.max(kkt),
                q=jnp.max(sol.iters), qs=jnp.max(sol.status),
                c=jnp.max(c_aug), t=jnp.max(tau), a=jnp.median(alpha),
                l=jnp.max(jnp.abs(lam_qp)), dn=jnp.max(jnp.abs(d)),
            )

        # freeze converged elements (mask-and-continue, cf. the QP solver)
        runc = run[:, None]
        runm = run[:, None, None]
        qp_iters_new = st.qp_iters + jnp.where(run, sol.iters, 0)
        if params.qp_budget is not None:
            # per-member total inner-iteration budget: freeze the member as
            # IterationLimit instead of dragging its lockstep group to the
            # inner cap for every remaining SQP iteration (the rescue pass
            # re-solves it solo)
            exhausted = jnp.logical_and(
                jnp.logical_and(run, jnp.logical_not(done_new)),
                qp_iters_new >= params.qp_budget,
            )
        else:
            exhausted = jnp.zeros_like(run)
        if params.stall_iters is not None:
            # stall freeze: a member whose KKT has not made stall_ratio
            # progress for stall_iters consecutive iterations is diverging
            # (measured: KKT stuck at ~1e0 for 60 lockstep iterations);
            # freeze it as IterationLimit for the rescue pass
            prog_m = kkt < st.kkt_mark * params.stall_ratio
            kkt_mark_new = jnp.where(
                jnp.logical_and(run, prog_m), kkt, st.kkt_mark
            )
            stall_ct_new = jnp.where(
                run,
                jnp.where(prog_m, jnp.int32(0), st.stall_ct + 1),
                st.stall_ct,
            )
            exhausted = jnp.logical_or(
                exhausted,
                jnp.logical_and(
                    jnp.logical_and(run, jnp.logical_not(done_new)),
                    stall_ct_new >= params.stall_iters,
                ),
            )
        else:
            kkt_mark_new, stall_ct_new = st.kkt_mark, st.stall_ct
        return _BState(
            it=st.it + 1,
            x=jnp.where(runc, x_new, st.x),
            lam=jnp.where(runc, lam_new, st.lam),
            z=jnp.where(runc, z_new, st.z),
            reg=jnp.where(run, reg, st.reg),
            tau=jnp.where(run, tau, st.tau),
            caug=jnp.where(run, c_aug, st.caug),
            kkt=jnp.where(run, kkt, st.kkt),
            done=jnp.logical_or(st.done, jnp.logical_or(done_new, exhausted)),
            failed=jnp.logical_or(st.failed, exhausted),
            iters=jnp.where(run, st.it + 1, st.iters),
            qp_iters=qp_iters_new,
            kkt_mark=kkt_mark_new,
            stall_ct=stall_ct_new,
            qp_ws=jax.tree.map(
                lambda a, b: jnp.where(
                    run.reshape((B,) + (1,) * (a.ndim - 1)), a, b
                ),
                sol,
                st.qp_ws,
            ),
            fval=jnp.where(run, f_new, st.fval),
            gval=jnp.where(runc, g_new, st.gval),
            grad=jnp.where(runc, grad_new, st.grad),
            J=jnp.where(runm, J_new, st.J),
            Hb=jnp.where(runm, Hb, st.Hb),
            fh=jnp.where(
                runc,
                jnp.concatenate([st.fh[:, 1:], f_new[:, None]], axis=1),
                st.fh,
            ),
            vh=jnp.where(
                runc,
                jnp.concatenate(
                    [st.vh[:, 1:], _violation_b(x_new, g_new)[:, None]],
                    axis=1,
                ),
                st.vh,
            ),
        )

    def cond(st: _BState):
        return jnp.logical_and(
            st.it < params.max_iter, jnp.logical_not(st.done).any()
        )

    lam_init = jnp.zeros((B, m), dt) if lam0 is None else jnp.asarray(lam0, dt)
    ws0 = _zero_qp_ws((B,), n, m, dt)
    x0 = jnp.asarray(x0, dt)
    st0 = _BState(
        it=jnp.int32(0),
        x=x0,
        lam=lam_init,
        z=jnp.zeros((B, n), dt),
        reg=jnp.full((B,), params.reg_init, dt),
        tau=jnp.full((B,), params.reg_init, dt),
        caug=jnp.zeros((B,), dt),
        kkt=jnp.full((B,), inf),
        done=jnp.zeros((B,), bool),
        failed=jnp.zeros((B,), bool),
        iters=jnp.zeros((B,), jnp.int32),
        qp_iters=jnp.zeros((B,), jnp.int32),
        kkt_mark=jnp.full((B,), inf),
        stall_ct=jnp.zeros((B,), jnp.int32),
        qp_ws=ws0,
        fval=fB(thetas, x0),
        gval=gB(thetas, x0),
        grad=gradB(thetas, x0),
        J=JB(thetas, x0),
        Hb=eyeN_b,
        fh=jnp.tile(
            fB(thetas, x0)[:, None], (1, max(1, params.nonmonotone_M))
        ),
        vh=jnp.tile(
            _violation_b(x0, gB(thetas, x0))[:, None],
            (1, max(1, params.nonmonotone_M)),
        ),
    )
    st = lax.while_loop(cond, body, st0)

    status = jnp.where(
        jnp.logical_and(st.done, jnp.logical_not(st.failed)),
        int(NLPSolutionStatus.Optimal),
        int(NLPSolutionStatus.IterationLimit),
    ).astype(jnp.int32)
    return NLPSolution(
        status=status,
        iters=st.iters,
        x=st.x,
        zl=jnp.maximum(-st.z, 0.0),
        zu=jnp.maximum(st.z, 0.0),
        lam=st.lam,
        objective=fB(thetas, st.x),
        kkt_res=st.kkt,
        qp_iters=st.qp_iters,
    )


class _RescueCache:
    """Memo of the jitted rescue solves keyed on (family identity, params,
    mode); strong reference to the family callable guards id reuse (same
    rationale as ocp.solve._SolveCache)."""

    def __init__(self, maxsize: int = 16):
        self._entries = {}
        self._maxsize = maxsize

    def get(self, make_nlp, params, mode="solo"):
        key = (id(make_nlp), params, mode)
        hit = self._entries.get(key)
        if hit is not None and hit[0] is make_nlp:
            return hit[1]
        if mode == "solo":
            fn = jax.jit(
                lambda th, xx: solve_nlp_sqp(make_nlp(th), xx, params)
            )
        else:  # "multi": one member's multistart candidates as a tiny batch
            fn = jax.jit(
                lambda th, xx: solve_nlp_sqp_batch(make_nlp, th, xx, params)
            )
        if len(self._entries) >= self._maxsize:
            self._entries.pop(next(iter(self._entries)))
        self._entries[key] = (make_nlp, fn)
        return fn


_rescue_cache = _RescueCache()


def rescue_nonoptimal(
    make_nlp,
    thetas,
    sol: NLPSolution,
    params: SQPParams,
    *,
    qp_iter_scale: int = 4,
    iter_scale: int = 2,
    budget_scale: Optional[float] = None,
    adaptive_rho: Optional[bool] = None,
    stall_scale: int = 1,
    multistart: int = 4,
    perturb_scale: float = 0.1,
    x0_cold=None,
    seed: int = 0,
) -> tuple[NLPSolution, int]:
    """Re-solve the non-Optimal members of a fleet solution.

    The lockstep fleet gives every member the SAME budgets; the rare member
    that exhausts them (the abandoned tail of the sweep artifacts) gets a
    second pass here — the batched analog of the reference's refinement loop
    simply iterating Ipopt until convergence on each problem
    (examples/ocp_se2_nlp.cpp:47-91).  Two stages:

    1. **Warmstarted re-solve** (packed ``multistart``-wide lockstep
       groups; solo when ``multistart <= 1``): ``qp_iter_scale``x the
       inner-ADMM budget, ``iter_scale``x the SQP budget, fresh
       multipliers, and the fleet's last iterate as the primal
       warmstart.  ``params.qp_budget`` — scaled by ``budget_scale``
       (default: the historical ``qp_iter_scale`` coupling) — bounds the
       total work, so a genuinely diverging member cannot burn
       ``max_iter x qp.max_iter`` inner iterations the way an unbounded
       warmstarted retry would (measured: 289k wasted inner iterations on
       one SE(2) sweep member whose fleet iterate was in a divergent
       basin); ``params.stall_iters``, if set, cuts such a member off
       after the stall window instead of at budget exhaustion.
    2. **Perturbed multistart** for members stage 1 did not converge: a
       tiny ``multistart``-wide batch per member — the cold start
       (``x0_cold``, else zeros), the cold start under a geometric ladder
       of Gaussian perturbations (``perturb_scale`` x (1 + |cold|_inf)),
       and the best-so-far iterate perturbed — solved in lockstep with the
       same boosted budgets; the best candidate (Optimal, else lowest KKT)
       wins.  This is the standard escape hatch for a warmstart sitting in
       the wrong basin; budgets make the lockstep safe (exhausted
       candidates freeze instead of dragging the group).

    Host-side driver (NOT jittable: statuses are materialized to find the
    failed members); each stage's solve is jitted once per (family, params)
    with fixed shapes and reused across members and calls.  Returns
    ``(merged_sol, n_rescued)``; a member's fields are replaced only when a
    rescue ends Optimal or strictly improves its KKT residual, and
    ``iters``/``qp_iters`` accumulate ALL attempted work (every candidate)
    for honest accounting.
    """
    import numpy as np

    bad = np.flatnonzero(
        np.asarray(sol.status) != int(NLPSolutionStatus.Optimal)
    )
    if bad.size == 0:
        return sol, 0

    # adaptive_rho (None = inherit): the members that reach rescue are
    # mostly the ones whose subproblem ADMM stalls at the iteration cap, so
    # each extra SQP iteration costs the FULL (scaled) cap.  Residual-
    # balancing rho adaptation cuts exactly those straggler iterations
    # (measured 8.3x on the CPU sweep), and the refactorization objection
    # that makes it a net loss on the WIDE main fleet does not apply to a
    # multistart-wide rescue batch (factorization there is trivial next to
    # the straggler iterations it saves).
    qp_prm = dataclasses.replace(
        params.qp, max_iter=params.qp.max_iter * qp_iter_scale
    )
    if adaptive_rho is not None:
        qp_prm = dataclasses.replace(qp_prm, adaptive_rho=adaptive_rho)
    prm = dataclasses.replace(
        params,
        max_iter=params.max_iter * iter_scale,
        qp=qp_prm,
        # The per-subproblem cap scale (qp_iter_scale) is cheap — it only
        # lets a stalled subproblem run deeper when needed — but the TOTAL
        # budget sets the rescue's worst-case wall time directly: a
        # diverging candidate runs its lockstep group to budget exhaustion
        # (~30 us/iteration on the SE(2) sweep — budget x scale 4 measured
        # 17 s/rep of rescue).  budget_scale decouples the two; default
        # keeps the historical qp_iter_scale coupling.
        qp_budget=(
            int(params.qp_budget * (
                qp_iter_scale if budget_scale is None else budget_scale
            ))
            if params.qp_budget
            else None
        ),
        chunk_size=None,
        probe_iters=0,
        # a rescue legitimately converges more slowly than the fleet's
        # healthy members (deep warmstarted tails, cold multistarts), so
        # the inherited stall window can be loosened by stall_scale
        stall_iters=(
            params.stall_iters * stall_scale
            if params.stall_iters is not None
            else None
        ),
    )
    out = {k: np.asarray(v).copy() for k, v in sol._asdict().items()}

    def _merge(i, ri):
        """Adopt candidate ri for member i iff it improves; charge its work."""
        improved = int(ri.status) == int(NLPSolutionStatus.Optimal) or float(
            ri.kkt_res
        ) < float(out["kkt_res"][i])
        if improved:
            for k in ("status", "x", "zl", "zu", "lam", "objective", "kkt_res"):
                out[k][i] = np.asarray(getattr(ri, k))
        out["iters"][i] += int(ri.iters)
        out["qp_iters"][i] += int(ri.qp_iters)
        return improved

    # ---- stage 1: warmstarted from the fleet iterate.  With
    # multistart > 1 the failed members are packed into multistart-wide
    # lockstep groups running the SAME compiled program stage 2 uses (one
    # batch shape to compile, one dispatch per group instead of per
    # member — a solo TPU dispatch of this program is ~1 s of latency);
    # the last group pads by repeating its first member, and only the
    # real entries are merged/charged.  Budgets make the tiny lockstep
    # safe: an exhausted member freezes instead of dragging the group.
    if multistart > 1:
        W = int(multistart)
        msolve = _rescue_cache.get(make_nlp, prm, "multi")
        for g in range(0, bad.size, W):
            idx = bad[g : g + W]
            pad = np.concatenate([idx, np.full(W - idx.size, idx[0], idx.dtype)])
            th_g = jax.tree.map(lambda a: jnp.asarray(a)[pad], thetas)
            rg = msolve(th_g, jnp.asarray(out["x"][pad]))
            for j, i in enumerate(idx):
                _merge(i, jax.tree.map(lambda a: a[j], rg))
    else:
        solve = _rescue_cache.get(make_nlp, prm, "solo")
        for i in bad:
            th_i = jax.tree.map(lambda a: a[i], thetas)
            _merge(i, solve(th_i, sol.x[i]))

    # ---- stage 2: perturbed multistart for members still not Optimal
    still = [
        i for i in bad
        if int(out["status"][i]) != int(NLPSolutionStatus.Optimal)
    ]
    if multistart > 1 and still:
        msolve = _rescue_cache.get(make_nlp, prm, "multi")
        sig = [0.3, 1.0, 3.0, 0.3, 1.0, 10.0][: max(multistart - 1, 1)]
        for i in still:
            th_i = jax.tree.map(lambda a: a[i], thetas)
            th_rep = jax.tree.map(
                lambda a: jnp.broadcast_to(a, (multistart,) + a.shape), th_i
            )
            xb = np.asarray(out["x"][i])
            cold = (
                np.asarray(x0_cold[i])
                if x0_cold is not None
                else np.zeros_like(xb)
            )
            scale = perturb_scale * (1.0 + float(np.max(np.abs(cold))))
            rng = np.random.default_rng(seed * 100003 + int(i))
            cands = [cold]
            for k in range(multistart - 1):
                base = xb if k == len(sig) - 1 else cold  # last: best-so-far
                cands.append(
                    base + sig[k] * scale * rng.standard_normal(xb.shape)
                )
            ri = msolve(th_rep, jnp.asarray(np.stack(cands), sol.x.dtype))
            stat = np.asarray(ri.status)
            kkts = np.asarray(ri.kkt_res)
            opt = stat == int(NLPSolutionStatus.Optimal)
            best = int(
                np.flatnonzero(opt)[np.argmin(kkts[opt])]
                if opt.any()
                else np.argmin(kkts)
            )
            picked = jax.tree.map(lambda a: a[best], ri)
            # charge every candidate's work, adopt only the winner
            picked = picked._replace(
                iters=jnp.sum(ri.iters), qp_iters=jnp.sum(ri.qp_iters)
            )
            _merge(i, picked)

    merged = NLPSolution(**{k: jnp.asarray(v) for k, v in out.items()})
    return merged, int(bad.size)
