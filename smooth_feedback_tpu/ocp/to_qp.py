"""OCP -> dense QP transcription via linearization (the MPC path).

TPU-native re-derivation of the reference's ocp_to_qp (ocp_to_qp.hpp:41-435):
the nonlinear Lie-group OCP is linearized in the tangent space around a
nominal trajectory (xl(t), ul(t)) and collocated on an LGR mesh, producing a
dense block-banded QP over

    z = [dx_0 ... dx_N,  du_0 ... du_{N-1}]      (tangent coordinates)

with constraints [dynamics defects; running constraints; end constraints].

Differences from the reference, by design:

* The QP is dense fixed-shape (XLA/MXU-friendly) instead of row-major sparse;
  block structure is realized with index scatters precomputed at trace time.
* All linearizations are ``jax.jacfwd``/``jax.hessian`` of the user's actual
  cost/constraint functions — the reference's hand-maintained "analytic
  derivatives valid at the linearization point" (mpc.hpp:68-302) are
  unnecessary because tracing happens once at compile time.
* The whole transcription is one traced function: under ``jax.vmap`` it
  assembles thousands of QPs in parallel.

The non-commutative correction ``-(tf/2) ad(f + dxl)`` on the state Jacobian
(ocp_to_qp.hpp:262-264) is preserved exactly.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..groups.base import LieGroup
from ..qp.types import QPSolution, QuadraticProgram
from .collocation.mesh import Mesh, diffmat_local
from .collocation.functions import mesh_interp
from .ocp import OCP, OCPSolution


def variable_layout(ocp: OCP, mesh: Mesh):
    """Index layout [x-vars, u-vars] / [dyn, cr, ce] (ocp_to_qp.hpp:52-72)."""
    N = mesh.N_colloc
    nx, nu = ocp.nx, ocp.nu
    xvar_L = nx * (N + 1)
    uvar_L = nu * N
    dcon_L = nx * N
    crcon_L = ocp.ncr * N
    cecon_L = ocp.nce
    return dict(
        N=N,
        nx=nx,
        nu=nu,
        xvar_B=0,
        xvar_L=xvar_L,
        uvar_B=xvar_L,
        uvar_L=uvar_L,
        Nvar=xvar_L + uvar_L,
        dcon_B=0,
        dcon_L=dcon_L,
        crcon_B=dcon_L,
        crcon_L=crcon_L,
        cecon_B=dcon_L + crcon_L,
        cecon_L=cecon_L,
        Ncon=dcon_L + crcon_L + cecon_L,
    )


def body_velocity(G: LieGroup, xfun: Callable, t):
    """Body velocity ``d^r xl / dt`` of a group-valued trajectory at ``t``."""
    h0 = jnp.zeros((), dtype=jnp.result_type(t, 1.0))
    return jax.jacfwd(lambda h: G.rminus(xfun(t + h), xfun(t)))(h0)


def ocp_to_qp(
    ocp: OCP,
    mesh: Mesh,
    tf,
    xl_fun: Callable,
    ul_fun: Callable,
    dxl_fun: Optional[Callable] = None,
) -> QuadraticProgram:
    """Build the dense QP linearizing ``ocp`` around ``(xl_fun, ul_fun)``
    (cf. ocp_to_qp, ocp_to_qp.hpp:421-435).

    ``xl_fun(t) -> X-params``, ``ul_fun(t) -> U-params`` must be jax-traceable
    on ``t in [0, tf]``; ``dxl_fun(t) -> (nx,)`` optionally supplies the body
    velocity of ``xl_fun`` (otherwise obtained by autodiff in time).
    Fully traced: jit/vmap-compatible, with ``mesh`` static.
    """
    # the transcription's Jacobians and cost expansions feed a QP solved to
    # 1e-3..1e-6; TPU bf16 default-precision matmuls would perturb A/P at
    # ~1e-2 relative, so force full precision like the solvers do
    with jax.default_matmul_precision("highest"):
        return _ocp_to_qp_impl(ocp, mesh, tf, xl_fun, ul_fun, dxl_fun)


def ocp_to_qp_vectors(
    ocp: OCP,
    mesh: Mesh,
    tf,
    xl_fun: Callable,
    ul_fun: Callable,
    dxl_fun: Optional[Callable] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The ``(q, l, u)`` VECTORS of the transcription only — the analog of
    the reference's allocate/update split (ocp_to_qp.hpp:387-435), for
    problem families whose QP matrices P/A are step-invariant (the
    ``reuse_factors``/``condense`` MPC conditions): the per-step update then
    needs only function values and cost GRADIENTS at the nodes — no
    dynamics/constraint Jacobians, no cost Hessians, no (Nvar x Nvar)
    scatters.  Exactly equal to the corresponding slices of ``ocp_to_qp``'s
    output (parity-tested)."""
    with jax.default_matmul_precision("highest"):
        return _ocp_to_qp_impl(
            ocp, mesh, tf, xl_fun, ul_fun, dxl_fun, vectors_only=True
        )


def _ocp_to_qp_impl(
    ocp: OCP,
    mesh: Mesh,
    tf,
    xl_fun: Callable,
    ul_fun: Callable,
    dxl_fun: Optional[Callable],
    vectors_only: bool = False,
):
    X, U = ocp.X, ocp.U
    lay = variable_layout(ocp, mesh)
    N, nx, nu = lay["N"], lay["nx"], lay["nu"]
    Nvar, Ncon = lay["Nvar"], lay["Ncon"]
    ncr, nce = ocp.ncr, ocp.nce
    t0 = 0.0

    taus = np.asarray(mesh.all_nodes())  # (N+1,) static
    ws = np.asarray(mesh.all_weights())  # (N+1,) static, last = 0
    tf = jnp.asarray(tf)
    dt_ = jnp.result_type(tf, 1.0)
    ts = t0 + (tf - t0) * jnp.asarray(taus)  # (N+1,) traced

    if dxl_fun is None:
        dxl_fun = lambda t: body_velocity(X, xl_fun, t)

    # ---- linearization trajectories at the nodes
    xls = jax.vmap(xl_fun)(ts)  # (N+1, xparams)
    uls = jax.vmap(ul_fun)(ts[:N])  # (N, uparams)
    dxls = jax.vmap(dxl_fun)(ts)  # (N+1, nx)

    zx = jnp.zeros((nx,), dt_)
    zu = jnp.zeros((nu,), dt_)

    # =================================================================== cost
    # (cf. ocp_to_qp_update_cost, ocp_to_qp.hpp:117-195)
    ql = jnp.ones((1,), dt_)
    xl0, xlf = xls[0], xls[N]

    def theta_t(wx0, wxf, dq):
        return ocp.theta(tf, X.rplus(xl0, wx0), X.rplus(xlf, wxf), ql + dq)

    th_grad = jax.grad(theta_t, argnums=(0, 1, 2))(zx, zx, jnp.zeros((1,), dt_))
    qo_x0, qo_xf, qo_q = th_grad

    # per-node integrand value/grad/hessian (separable => block-diagonal d2F)
    def g_node(t, xl, ul, w):
        return ocp.g(t, X.rplus(xl, w[:nx]), U.rplus(ul, w[nx:]))[0]

    zxu = jnp.zeros((nx + nu,), dt_)
    g_grads = jax.vmap(
        lambda t, xl, ul: jax.grad(lambda w: g_node(t, xl, ul, w))(zxu)
    )(ts[:N], xls[:N], uls)  # (N, nx+nu)

    wtf = jnp.asarray(ws[:N]) * (tf - t0)  # (N,) quadrature * horizon

    q = jnp.zeros((Nvar,), dt_)
    xrows = np.arange(N)[:, None] * nx + np.arange(nx)[None, :]  # (N, nx)
    urows = lay["uvar_B"] + np.arange(N)[:, None] * nu + np.arange(nu)[None, :]
    gq = qo_q[0] * wtf[:, None] * g_grads  # (N, nx+nu)
    q = q.at[xrows].add(gq[:, :nx])
    q = q.at[urows].add(gq[:, nx:])

    x0_idx = np.arange(nx)
    xf_idx = N * nx + np.arange(nx)
    q = q.at[x0_idx].add(qo_x0)
    q = q.at[xf_idx].add(qo_xf)

    if not vectors_only:
        th_hess = jax.hessian(
            lambda w: theta_t(w[:nx], w[nx : 2 * nx], w[2 * nx :])
        )(jnp.zeros((2 * nx + 1,), dt_))
        g_hesss = jax.vmap(
            lambda t, xl, ul: jax.hessian(lambda w: g_node(t, xl, ul, w))(zxu)
        )(ts[:N], xls[:N], uls)  # (N, nx+nu, nx+nu)

        P = jnp.zeros((Nvar, Nvar), dt_)
        # integral cost: P += qo_q * blockdiag_i( w_i tf Hess_i )
        hx = qo_q[0] * wtf[:, None, None] * g_hesss  # (N, nx+nu, nx+nu)
        # scatter per-node blocks: xx, xu, ux, uu
        P = P.at[xrows[:, :, None], xrows[:, None, :]].add(hx[:, :nx, :nx])
        P = P.at[xrows[:, :, None], urows[:, None, :]].add(hx[:, :nx, nx:])
        P = P.at[urows[:, :, None], xrows[:, None, :]].add(hx[:, nx:, :nx])
        P = P.at[urows[:, :, None], urows[:, None, :]].add(hx[:, nx:, nx:])

        # endpoint cost: P += 0.5 * Hess(theta) blocks (reference scale,
        # ocp_to_qp.hpp:189-191)
        P = P.at[np.ix_(x0_idx, x0_idx)].add(0.5 * th_hess[:nx, :nx])
        P = P.at[np.ix_(x0_idx, xf_idx)].add(0.5 * th_hess[:nx, nx : 2 * nx])
        P = P.at[np.ix_(xf_idx, x0_idx)].add(0.5 * th_hess[nx : 2 * nx, :nx])
        P = P.at[np.ix_(xf_idx, xf_idx)].add(
            0.5 * th_hess[nx : 2 * nx, nx : 2 * nx]
        )

    # ============================================================== dynamics
    # (cf. ocp_to_qp_update_dyn, ocp_to_qp.hpp:199-276)
    l = jnp.zeros((Ncon,), dt_)
    u = jnp.zeros((Ncon,), dt_)
    drows = np.arange(N)[:, None] * nx + np.arange(nx)[None, :]  # (N, nx) dyn rows

    if vectors_only:
        fvals = jax.vmap(ocp.f)(ts[:N], xls[:N], uls)  # (N, nx)
    else:

        def lin_dyn(t, xl, ul):
            fval = ocp.f(t, xl, ul)
            Af = jax.jacfwd(lambda w: ocp.f(t, X.rplus(xl, w), ul))(zx)
            Bf = jax.jacfwd(lambda v: ocp.f(t, xl, U.rplus(ul, v)))(zu)
            return fval, Af, Bf

        fvals, Afs, Bfs = jax.vmap(lin_dyn)(ts[:N], xls[:N], uls)

        A = jnp.zeros((Ncon, Nvar), dt_)
        Ablocks = tf * Afs
        if not X.is_commutative():
            ad_corr = jax.vmap(lambda i: X.ad(i))(fvals + dxls[:N])  # (N, nx, nx)
            Ablocks = Ablocks - 0.5 * tf * ad_corr
        Bblocks = tf * Bfs

        A = A.at[drows[:, :, None], xrows[:, None, :]].add(Ablocks)
        A = A.at[drows[:, :, None], urows[:, None, :]].add(Bblocks)

        # differentiation-matrix coupling: row block i, col block j: -alpha D[j,i] I
        # (single scatter with indices precomputed at trace time)
        offsets = mesh.interval_offsets()
        R_idx, C_idx, V_val = [], [], []
        for ival in range(mesh.N_ivals):
            K = mesh.N_colloc_ival(ival)
            D = diffmat_local(K)  # (K+1, K) static
            alpha = mesh.interval_diffmat_unscaled(ival)[0]
            o = int(offsets[ival])
            rows_i = (o + np.arange(K))[:, None, None] * nx + np.arange(nx)[None, None, :]
            cols_j = (o + np.arange(K + 1))[None, :, None] * nx + np.arange(nx)[None, None, :]
            R3 = np.broadcast_to(rows_i, (K, K + 1, nx))
            C3 = np.broadcast_to(cols_j, (K, K + 1, nx))
            V3 = np.broadcast_to((-alpha * D.T)[:, :, None], (K, K + 1, nx))
            R_idx.append(R3.reshape(-1))
            C_idx.append(C3.reshape(-1))
            V_val.append(V3.reshape(-1))
        A = A.at[np.concatenate(R_idx), np.concatenate(C_idx)].add(
            jnp.asarray(np.concatenate(V_val), dtype=dt_)
        )

    ldyn = -tf * (fvals - dxls[:N])  # (N, nx)
    l = l.at[drows].set(ldyn)
    u = u.at[drows].set(ldyn)

    # ===================================================== running constraints
    # (cf. ocp_to_qp_update_cr, ocp_to_qp.hpp:279-323)
    if ncr > 0:
        crrows = lay["crcon_B"] + np.arange(N)[:, None] * ncr + np.arange(ncr)[None, :]
        if vectors_only:
            crs = jax.vmap(ocp.cr)(ts[:N], xls[:N], uls)
        else:

            def lin_cr(t, xl, ul):
                c = ocp.cr(t, xl, ul)
                Jx = jax.jacfwd(lambda w: ocp.cr(t, X.rplus(xl, w), ul))(zx)
                Ju = jax.jacfwd(lambda v: ocp.cr(t, xl, U.rplus(ul, v)))(zu)
                return c, Jx, Ju

            crs, Jxs, Jus = jax.vmap(lin_cr)(ts[:N], xls[:N], uls)
            A = A.at[crrows[:, :, None], xrows[:, None, :]].add(Jxs)
            A = A.at[crrows[:, :, None], urows[:, None, :]].add(Jus)
        l = l.at[crrows].set(jnp.asarray(ocp.crl)[None, :] - crs)
        u = u.at[crrows].set(jnp.asarray(ocp.cru)[None, :] - crs)

    # ========================================================= end constraints
    # (cf. ocp_to_qp_update_ce, ocp_to_qp.hpp:326-373)
    if nce > 0:
        ceval = ocp.ce(tf, xl0, xlf, ql)
        cerows = lay["cecon_B"] + np.arange(nce)
        if not vectors_only:
            Jce0 = jax.jacfwd(lambda w: ocp.ce(tf, X.rplus(xl0, w), xlf, ql))(zx)
            Jcef = jax.jacfwd(lambda w: ocp.ce(tf, xl0, X.rplus(xlf, w), ql))(zx)
            A = A.at[np.ix_(cerows, x0_idx)].add(Jce0)
            A = A.at[np.ix_(cerows, xf_idx)].add(Jcef)
        l = l.at[cerows].set(jnp.asarray(ocp.cel) - ceval)
        u = u.at[cerows].set(jnp.asarray(ocp.ceu) - ceval)

    if vectors_only:
        return q, l, u
    return QuadraticProgram(P=P, q=q, A=A, l=l, u=u)


def qpsol_to_ocpsol(
    ocp: OCP,
    mesh: Mesh,
    qpsol: QPSolution,
    tf,
    xl_fun: Callable,
    ul_fun: Callable,
) -> OCPSolution:
    """Interpolate a QP solution back into OCP trajectories
    (cf. qpsol_to_ocpsol, ocp_to_qp.hpp:452-499)."""
    lay = variable_layout(ocp, mesh)
    N, nx, nu = lay["N"], lay["nx"], lay["nu"]
    Xmat = qpsol.primal[: lay["xvar_L"]].reshape(N + 1, nx)
    Umat = qpsol.primal[lay["uvar_B"] :].reshape(N, nu)
    X, U = ocp.X, ocp.U
    tf = jnp.asarray(tf)

    def xfun(t):
        tngnt = mesh_interp(mesh, Xmat, t / tf, extend=True)
        return X.rplus(xl_fun(t), tngnt)

    def ufun(t):
        tngnt = mesh_interp(mesh, Umat, t / tf, extend=False)
        return U.rplus(ul_fun(t), tngnt)

    return OCPSolution(t0=0.0, tf=tf, x=xfun, u=ufun)
