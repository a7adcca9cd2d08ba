"""Active Set Invariance safety Filter (ASIF) on Lie groups.

TPU-native re-design of the reference ASIF (asif.hpp:41-112,
asif_func.hpp:39-260).  The filter minimally modifies a desired input so that
barrier constraints h(t, x) >= 0 remain invariant along a backup trajectory:

    min_{mu, delta}  (mu' W_u mu) + relax_cost * delta^2
    s.t.             d/dt h(phi_t(x0)) >= -alpha h(phi_t(x0)) - delta  (K times)
                     u_des (+) mu  in  ulim,   delta >= 0

Construction: a fixed-step `lax.scan` forward-integrates the backup closed
loop x' = f(x, bu(t, x)) together with its body-frame sensitivity
S' = (-ad(f_cl) + d^r f_cl/dx) S (asif_func.hpp:148-152), emitting one barrier
row per constraint time; the small dense QP solves with the batched ADMM
kernel.  Everything is one traced function — fleets of filters vmap.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..groups.base import LieGroup, ad_generators
from ..utils.linalg import mm_lane
from ..qp.solver import solve_qp_batch
from ..qp.types import QPSolution, QPSolutionStatus, QPSolverParams, QuadraticProgram
from ..utils.bounds import ManifoldBounds


@dataclasses.dataclass(frozen=True)
class ASIFtoQPParams:
    """cf. reference ASIFtoQPParams (asif_func.hpp:58-68)."""

    K: int = 10  # number of constraint instances over the horizon
    alpha: float = 1.0  # barrier decay rate
    dt: float = 0.1  # maximal integration step
    relax_cost: float = 100.0  # relaxation penalty


@dataclasses.dataclass(frozen=True)
class ASIFilterParams:
    """cf. reference ASIFilterParams (asif.hpp:17-32)."""

    T: float = 1.0  # backup horizon (static: determines step count)
    asif: ASIFtoQPParams = dataclasses.field(default_factory=ASIFtoQPParams)
    qp: QPSolverParams = dataclasses.field(default_factory=QPSolverParams)


def asif_to_qp(
    X: LieGroup,
    U: LieGroup,
    prm: ASIFtoQPParams,
    T: float,
    x0: jax.Array,
    u_des: jax.Array,
    W_u: jax.Array,
    ulim: ManifoldBounds,
    f: Callable,
    h: Callable,
    bu: Callable,
) -> QuadraticProgram:
    """Build the ASIF QP (cf. asif_to_qp, asif_func.hpp:244-260).

    Args:
      f: dynamics ``f(x, u) -> (nx,)`` body velocity.
      h: barrier ``h(t, x) -> (nh,)``; safe set is h >= 0.
      bu: backup controller ``bu(t, x) -> u-params``.

    ``T``, ``prm`` are static (they fix the scan length); everything else may
    be traced/batched.
    """
    # sensitivity propagation S' = (-ad(f)+J)S and barrier-row assembly feed
    # a QP; TPU bf16 default-precision matmuls would corrupt the rows
    with jax.default_matmul_precision("highest"):
        return _asif_to_qp_impl(X, U, prm, T, x0, u_des, W_u, ulim, f, h, bu)


def _asif_to_qp_impl(X, U, prm, T, x0, u_des, W_u, ulim, f, h, bu):
    nx, nu = X.ndof, U.ndof
    dt_ = jnp.result_type(x0)
    nh = int(jax.eval_shape(h, jnp.zeros(()), x0).shape[0])
    nb = int(ulim.A.shape[0])

    tau = T / prm.K
    n_sub = max(1, int(-(-tau // prm.dt)))  # ceil(tau / dt)
    hstep = tau / n_sub

    zx = jnp.zeros((nx,), dt_)
    zu = jnp.zeros((nu,), dt_)

    # dynamics value and input jacobian at the current state (asif_func.hpp:155-156)
    f0 = f(x0, u_des)
    df0_du = jax.jacfwd(lambda v: f(x0, U.rplus(u_des, v)))(zu)  # (nx, nu)

    def fcl(t, x):
        return f(x, bu(t, x))

    def sub_step(carry, _):
        t, x, S = carry
        x_new = X.rplus(x, hstep * fcl(t, x))
        # sensitivity uses the post-step state (reference stepper ordering,
        # asif_func.hpp:175-178 with captured-by-reference x)
        fv = fcl(t, x_new)
        J = jax.jacfwd(lambda w: fcl(t, X.rplus(x_new, w)))(zx)
        S_new = S + hstep * ((-X.ad(fv) + J) @ S)
        return (t + hstep, x_new, S_new), None

    def seg_step(carry, k):
        t, x, S = carry
        # barrier row at the current constraint time (asif_func.hpp:159-180)
        hval = h(t, x)
        dh_dt = jax.jacfwd(lambda s: h(s, x))(t)  # (nh,)
        dh_dx = jax.jacfwd(lambda w: h(t, X.rplus(x, w)))(zx)  # (nh, nx)
        dh_dx0 = dh_dx @ S
        Arow = dh_dx0 @ df0_du  # (nh, nu)
        lrow = -dh_dt - prm.alpha * hval - dh_dx0 @ f0

        # integrate to the next constraint time
        carry, _ = jax.lax.scan(sub_step, (t, x, S), None, length=n_sub)
        return carry, (Arow, lrow)

    init = (jnp.zeros((), dt_), x0, jnp.eye(nx, dtype=dt_))
    _, (Arows, lrows) = jax.lax.scan(seg_step, init, jnp.arange(prm.K))
    # Arows: (K, nh, nu); lrows: (K, nh)

    M = prm.K * nh + nb + 1
    N = nu + 1
    inf = jnp.asarray(jnp.inf, dt_)

    A = jnp.zeros((M, N), dt_)
    A = A.at[: prm.K * nh, :nu].set(Arows.reshape(prm.K * nh, nu))
    A = A.at[: prm.K * nh, nu].set(1.0)  # relaxation column
    l = jnp.full((M,), -inf, dt_)
    u = jnp.full((M,), inf, dt_)
    l = l.at[: prm.K * nh].set(lrows.reshape(-1))

    if nb > 0:
        # input bounds (asif_func.hpp:186-188)
        du_c = ulim.A @ U.rminus(u_des, ulim.c)
        A = A.at[prm.K * nh : prm.K * nh + nb, :nu].set(ulim.A)
        l = l.at[prm.K * nh : prm.K * nh + nb].set(ulim.l - du_c)
        u = u.at[prm.K * nh : prm.K * nh + nb].set(ulim.u - du_c)

    # delta >= 0 (asif_func.hpp:191-193)
    A = A.at[M - 1, nu].set(1.0)
    l = l.at[M - 1].set(0.0)

    P = jnp.zeros((N, N), dt_)
    P = P.at[jnp.arange(nu), jnp.arange(nu)].set(jnp.asarray(W_u, dt_))
    P = P.at[nu, nu].set(prm.relax_cost)
    q = jnp.zeros((N,), dt_)

    return QuadraticProgram(P=P, q=q, A=A, l=l, u=u)


def asif_to_qp_fleet(
    X: LieGroup,
    U: LieGroup,
    prm: ASIFtoQPParams,
    T: float,
    xs: jax.Array,
    u_des: jax.Array,
    W_u: jax.Array,
    ulim: ManifoldBounds,
    f: Callable,
    h: Callable,
    bu: Callable,
) -> QuadraticProgram:
    """Fleet ASIF transcription: ``jax.vmap(asif_to_qp)`` with the
    sensitivity propagation in batch-TRAILING layout.

    The vmapped form integrates the (B, nx, nx) sensitivity stack with its
    minor dims padded to TPU (8, 128) tiles (~20x memory waste at nx=6, and
    growing with B); here ``S`` is carried as (nx, nx, B) — the fleet on the
    lanes — with the per-member user callables (f, h, bu and their tangent
    Jacobians) evaluated batch-leading and moved across once per substep.
    Same math, parity-tested against the vmapped transcription.
    """
    with jax.default_matmul_precision("highest"):
        return _asif_to_qp_fleet_impl(
            X, U, prm, T, xs, u_des, W_u, ulim, f, h, bu
        )


def _asif_to_qp_fleet_impl(X, U, prm, T, xs, u_des, W_u, ulim, f, h, bu):
    nx, nu = X.ndof, U.ndof
    B = xs.shape[0]
    dt_ = jnp.result_type(xs)
    nh = int(jax.eval_shape(h, jnp.zeros(()), xs[0]).shape[0])
    nb = int(ulim.A.shape[0])

    tau = T / prm.K
    n_sub = max(1, int(-(-tau // prm.dt)))  # ceil(tau / dt)
    hstep = tau / n_sub

    zx = jnp.zeros((nx,), dt_)
    zu = jnp.zeros((nu,), dt_)
    eye = jnp.eye(nx, dtype=dt_)
    # ad is linear: constant generators let ad(f_cl) assemble in trailing
    # layout straight from the (nx, B) velocity stack
    adgen = ad_generators(X, dt_)

    # dynamics value and input jacobian at the current states
    f0 = jax.vmap(f)(xs, u_des)  # (B, nx)
    df0_du = jax.vmap(
        lambda x, ud: jax.jacfwd(lambda v: f(x, U.rplus(ud, v)))(zu)
    )(xs, u_des)
    df0t = jnp.moveaxis(df0_du, 0, -1)  # (nx, nu, B)
    f0t = f0.T  # (nx, B)

    def fcl(t, x):
        return f(x, bu(t, x))

    def sub_step(carry, _):
        t, x, St = carry
        fv0 = jax.vmap(lambda xi: fcl(t, xi))(x)
        x_new = jax.vmap(lambda xi, fi: X.rplus(xi, hstep * fi))(x, fv0)
        # sensitivity uses the post-step state (reference stepper ordering)
        fv = jax.vmap(lambda xi: fcl(t, xi))(x_new)
        J = jax.vmap(
            lambda xi: jax.jacfwd(lambda w: fcl(t, X.rplus(xi, w)))(zx)
        )(x_new)
        At = -jnp.einsum("kij,kb->ijb", adgen, fv.T) + jnp.moveaxis(J, 0, -1)
        St = St + hstep * mm_lane(At, St)
        return (t + hstep, x_new, St), None

    def seg_step(carry, k):
        t, x, St = carry
        hval = jax.vmap(lambda xi: h(t, xi))(x)  # (B, nh)
        dh_dt = jax.vmap(lambda xi: jax.jacfwd(lambda s: h(s, xi))(t))(x)
        dh_dx = jax.vmap(
            lambda xi: jax.jacfwd(lambda w: h(t, X.rplus(xi, w)))(zx)
        )(x)  # (B, nh, nx)
        dh_dx0 = mm_lane(jnp.moveaxis(dh_dx, 0, -1), St)  # (nh, nx, B)
        Arow = mm_lane(dh_dx0, df0t)  # (nh, nu, B)
        lrow = (
            -dh_dt.T
            - prm.alpha * hval.T
            - (dh_dx0 * f0t[None, :, :]).sum(axis=1)
        )  # (nh, B)
        carry, _ = jax.lax.scan(sub_step, (t, x, St), None, length=n_sub)
        return carry, (Arow, lrow)

    init = (
        jnp.zeros((), dt_),
        xs,
        jnp.broadcast_to(eye[:, :, None], (nx, nx, B)),
    )
    _, (Arows, lrows) = jax.lax.scan(seg_step, init, jnp.arange(prm.K))
    # Arows: (K, nh, nu, B); lrows: (K, nh, B)

    M = prm.K * nh + nb + 1
    N = nu + 1
    inf = jnp.asarray(jnp.inf, dt_)

    A = jnp.zeros((B, M, N), dt_)
    A = A.at[:, : prm.K * nh, :nu].set(
        jnp.moveaxis(Arows, -1, 0).reshape(B, prm.K * nh, nu)
    )
    A = A.at[:, : prm.K * nh, nu].set(1.0)  # relaxation column
    l = jnp.full((B, M), -inf, dt_)
    u = jnp.full((B, M), inf, dt_)
    l = l.at[:, : prm.K * nh].set(jnp.moveaxis(lrows, -1, 0).reshape(B, -1))

    if nb > 0:
        du_c = jax.vmap(lambda ud: ulim.A @ U.rminus(ud, ulim.c))(u_des)
        A = A.at[:, prm.K * nh : prm.K * nh + nb, :nu].set(
            jnp.broadcast_to(ulim.A[None], (B, nb, nu))
        )
        l = l.at[:, prm.K * nh : prm.K * nh + nb].set(ulim.l[None] - du_c)
        u = u.at[:, prm.K * nh : prm.K * nh + nb].set(ulim.u[None] - du_c)

    A = A.at[:, M - 1, nu].set(1.0)
    l = l.at[:, M - 1].set(0.0)

    P = jnp.zeros((N, N), dt_)
    P = P.at[jnp.arange(nu), jnp.arange(nu)].set(jnp.asarray(W_u, dt_))
    P = P.at[nu, nu].set(prm.relax_cost)
    P = jnp.broadcast_to(P[None], (B, N, N))
    q = jnp.zeros((B, N), dt_)

    return QuadraticProgram(P=P, q=q, A=A, l=l, u=u)


class ASIFStepResult(NamedTuple):
    u: jax.Array  # filtered input
    status: jax.Array
    warmstart: QPSolution


def make_asif_step(
    X: LieGroup,
    U: LieGroup,
    f: Callable,
    h: Callable,
    bu: Callable,
    *,
    params: ASIFilterParams = ASIFilterParams(),
    W_u: Optional[jax.Array] = None,
    ulim: Optional[ManifoldBounds] = None,
    dtype=None,
):
    """Build the functional ASIF step (cf. ASIFilter, asif.hpp:41-112).

    Returns ``(step, init_warmstart)`` where
    ``step(warmstart, x, u_des) -> ASIFStepResult`` is jit/vmap-compatible and
    returns the minimally-modified safe input ``u_des (+) mu``.
    """
    nu = U.ndof
    if W_u is None:
        W_u = jnp.ones((nu,), dtype)
    if ulim is None:
        from ..utils.bounds import empty_bounds

        ulim = empty_bounds(U, dtype)
    nh = int(
        jax.eval_shape(h, jnp.zeros(()), X.identity(dtype)).shape[0]
    )
    nb = int(ulim.A.shape[0])
    M = params.asif.K * nh + nb + 1
    N = nu + 1

    def _finalize(sol: QPSolution, warmstart: QPSolution, u_des) -> ASIFStepResult:
        mu = sol.primal[:nu]
        u = U.rplus(u_des, mu)
        ok = (
            (sol.status == QPSolutionStatus.Optimal)
            | (sol.status == QPSolutionStatus.MaxIterations)
            | (sol.status == QPSolutionStatus.MaxTime)
        )
        new_ws = jax.tree.map(lambda a, b: jnp.where(ok, a, b), sol, warmstart)
        return ASIFStepResult(u=u, status=sol.status, warmstart=new_ws)

    def step(warmstart: QPSolution, x, u_des) -> ASIFStepResult:
        qp = asif_to_qp(
            X, U, params.asif, params.T, x, u_des, W_u, ulim, f, h, bu
        )
        qp_b = jax.tree.map(lambda a: a[None], qp)
        ws_b = jax.tree.map(lambda a: a[None], warmstart)
        sol_b = solve_qp_batch(qp_b, params.qp, ws_b)
        sol = jax.tree.map(lambda a: a[0], sol_b)
        return _finalize(sol, warmstart, u_des)

    def fleet_step(warmstarts: QPSolution, xs, u_des) -> ASIFStepResult:
        """Batched ASIF step: QP construction (backup integration +
        sensitivities) is vmapped, but the fleet's QPs solve in ONE call to
        ``solve_qp_batch`` — keeping the solver's scalar-driven iteration
        control instead of degrading the stopping check into per-element
        selects under a naive ``vmap(step)`` (same rationale as the MPC
        fleet path)."""
        qps = asif_to_qp_fleet(
            X, U, params.asif, params.T, xs, u_des, W_u, ulim, f, h, bu
        )
        sols = solve_qp_batch(qps, params.qp, warmstarts)
        return jax.vmap(_finalize)(sols, warmstarts, u_des)

    step.fleet = fleet_step

    init_ws = QPSolution(
        primal=jnp.zeros((N,), dtype),
        dual=jnp.zeros((M,), dtype),
        status=jnp.asarray(int(QPSolutionStatus.Unknown), jnp.int32),
        iters=jnp.asarray(0, jnp.int32),
        objective=jnp.asarray(0.0, dtype),
        primal_res=jnp.asarray(jnp.inf, dtype),
        dual_res=jnp.asarray(jnp.inf, dtype),
    )
    return step, init_ws


class ASIFilter:
    """Stateful convenience wrapper mirroring the reference class API
    (asif.hpp:41).  ``filter(x, u_des) -> (u, status)``."""

    def __init__(self, X, U, f, h, bu, *, params=ASIFilterParams(), W_u=None, ulim=None, dtype=None):
        self._step, self._ws = make_asif_step(
            X, U, f, h, bu, params=params, W_u=W_u, ulim=ulim, dtype=dtype
        )
        self._step = jax.jit(self._step)

    def __call__(self, x, u_des):
        res = self._step(self._ws, x, u_des)
        self._ws = res.warmstart
        return res.u, QPSolutionStatus(int(res.status))
