"""Flat OCP -> NLP transcription via LGR collocation (the Ipopt/SQP path).

TPU-native re-design of the reference's ocp_to_nlp.hpp: variables are

    z = [tf, q, X(N+1, nx).ravel(), U(N, nu).ravel()]

and constraints [dynamics defects; integral consistency; running; endpoint]
(ocp_nlp_structure, ocp_to_nlp.hpp:24-51).  The NLP's f and g are plain
traceable functions built from the collocation mesh operations — solvers
differentiate them with jax autodiff instead of consuming the reference's
hand-assembled sparse Jacobians/Hessians (ocp_to_nlp.hpp:175-416).

Scalings match the reference: dynamics defects carry quadrature weights, and
running-constraint rows and bounds are scaled by ``w_scaling * w_i`` with
``w_scaling = 1/max(w)`` (ocp_to_nlp.hpp:122-151).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .collocation.functions import mesh_dyn, mesh_eval, mesh_integrate, mesh_interp
from .collocation.mesh import Mesh
from .nlp import NLP, NLPSolution
from .ocp import OCP, OCPSolution


class NLPLayout(NamedTuple):
    N: int
    nx: int
    nu: int
    nq: int
    ncr: int
    nce: int
    tf_B: int
    q_B: int
    x_B: int
    u_B: int
    n: int
    d_B: int
    qc_B: int
    cr_B: int
    ce_B: int
    m: int


def nlp_layout(ocp: OCP, mesh: Mesh) -> NLPLayout:
    N = mesh.N_colloc
    nx, nu, nq, ncr, nce = ocp.nx, ocp.nu, ocp.nq, ocp.ncr, ocp.nce
    tf_B = 0
    q_B = 1
    x_B = q_B + nq
    u_B = x_B + nx * (N + 1)
    n = u_B + nu * N
    d_B = 0
    qc_B = d_B + nx * N
    cr_B = qc_B + nq
    ce_B = cr_B + ncr * N
    m = ce_B + nce
    return NLPLayout(N, nx, nu, nq, ncr, nce, tf_B, q_B, x_B, u_B, n, d_B, qc_B, cr_B, ce_B, m)


def split_vars(lay: NLPLayout, z):
    tf = z[lay.tf_B]
    q = z[lay.q_B : lay.q_B + lay.nq]
    X = z[lay.x_B : lay.u_B].reshape(lay.N + 1, lay.nx)
    U = z[lay.u_B :].reshape(lay.N, lay.nu)
    return tf, q, X, U


def node_scalings(mesh: Mesh, dtype=None) -> jax.Array:
    """Per-node constraint-row scaling ``w_scaling * w_i`` applied to the
    dynamics-defect and running-constraint rows (ocp_to_nlp.hpp:122-151).
    Multipliers of those rows carry the INVERSE of this scaling; dividing it
    out recovers the smooth continuous-time (density) multipliers that
    interpolate and transfer across meshes."""
    ws = np.asarray(mesh.all_weights())
    w_scaling = 1.0 / max(1e-6, float(ws.max()))
    return jnp.asarray(w_scaling * ws[: mesh.N_colloc], dtype)


def ocp_to_nlp(ocp: OCP, mesh: Mesh, dtype=None) -> NLP:
    """Transcribe a flat OCP into an NLP (cf. ocp_to_nlp, ocp_to_nlp.hpp:432)."""
    lay = nlp_layout(ocp, mesh)
    N, nx, nu, nq, ncr, nce = lay.N, lay.nx, lay.nu, lay.nq, lay.ncr, lay.nce

    ws = np.asarray(mesh.all_weights())
    w_scaling = 1.0 / max(1e-6, float(ws.max()))
    w_nodes = jnp.asarray(ws[:N], dtype)

    def f(z):
        tf, q, X, U = split_vars(lay, z)
        return ocp.theta(tf, X[0], X[N], q)

    def g(z):
        tf, q, X, U = split_vars(lay, z)
        t0 = jnp.zeros_like(tf)

        # weighted collocation defects, scaled like the reference
        d = w_scaling * mesh_dyn(mesh, ocp.f, t0, tf, X, U, weighted=True)

        # integral consistency: q - sum w (tf) g = 0
        qv = q - mesh_integrate(mesh, ocp.g, t0, tf, X, U)

        # running constraints scaled by w_scaling * w_i
        crv = mesh_eval(mesh, ocp.cr, t0, tf, X, U)  # (N, ncr)
        crv = (w_scaling * w_nodes)[:, None] * crv

        cev = ocp.ce(tf, X[0], X[N], q)
        return jnp.concatenate([d.ravel(), qv, crv.ravel(), cev])

    inf = float("inf")
    xl = jnp.full((lay.n,), -inf, dtype).at[lay.tf_B].set(0.0)  # tf >= 0
    xu = jnp.full((lay.n,), inf, dtype)

    crl = jnp.asarray(ocp.crl, dtype)
    cru = jnp.asarray(ocp.cru, dtype)
    cr_l = ((w_scaling * w_nodes)[:, None] * crl[None, :]).ravel()
    cr_u = ((w_scaling * w_nodes)[:, None] * cru[None, :]).ravel()

    gl = jnp.concatenate(
        [jnp.zeros((nx * N + nq,), dtype), cr_l, jnp.asarray(ocp.cel, dtype)]
    )
    gu = jnp.concatenate(
        [jnp.zeros((nx * N + nq,), dtype), cr_u, jnp.asarray(ocp.ceu, dtype)]
    )

    return NLP(n=lay.n, m=lay.m, f=f, g=g, xl=xl, xu=xu, gl=gl, gu=gu)


def nlp_initial_guess(
    ocp: OCP, mesh: Mesh, tf: float, dtype=None
) -> jax.Array:
    """Zero-deviation initial guess with the given horizon."""
    lay = nlp_layout(ocp, mesh)
    z = jnp.zeros((lay.n,), dtype)
    return z.at[lay.tf_B].set(tf)


def nlpsol_to_ocpsol(
    ocp: OCP, mesh: Mesh, nlpsol: NLPSolution
) -> OCPSolution:
    """Reconstruct trajectory callables from an NLP solution
    (cf. nlpsol_to_ocpsol, ocp_to_nlp.hpp:442-508).

    The multiplier callables ``lam_dyn(t)`` / ``lam_cr(t)`` return the
    SCALING-FREE (density) multipliers — the raw NLP multipliers divided by
    the per-row transcription scaling ``w_scaling * w_i`` — so they
    interpolate as smooth functions of t and transfer exactly across meshes
    (the reference interpolates the raw scaled values, ocp_to_nlp.hpp:485-496,
    which bakes the old mesh's quadrature weights into the warmstart)."""
    lay = nlp_layout(ocp, mesh)
    tf, q, X, U = split_vars(lay, nlpsol.x)

    def xfun(t):
        return mesh_interp(mesh, X, t / tf, extend=True)

    def ufun(t):
        return mesh_interp(mesh, U, t / tf, extend=False)

    s = node_scalings(mesh, nlpsol.x.dtype)  # (N,)
    lam_d = nlpsol.lam[lay.d_B : lay.qc_B].reshape(lay.N, lay.nx) / s[:, None]
    lam_cr = nlpsol.lam[lay.cr_B : lay.ce_B].reshape(lay.N, lay.ncr) / s[:, None]

    def lam_dyn_fun(t):
        return mesh_interp(mesh, lam_d, t / tf, extend=False)

    def lam_cr_fun(t):
        return mesh_interp(mesh, lam_cr, t / tf, extend=False)

    return OCPSolution(
        t0=0.0,
        tf=tf,
        x=xfun,
        u=ufun,
        q=q,
        lam_q=nlpsol.lam[lay.qc_B : lay.cr_B],
        lam_ce=nlpsol.lam[lay.ce_B :],
        lam_dyn=lam_dyn_fun,
        lam_cr=lam_cr_fun,
    )


def ocpsol_to_nlpsol(
    ocp: OCP, mesh: Mesh, ocpsol: OCPSolution, dtype=None, multipliers: bool = False
):
    """Sample an OCP solution onto a (possibly different) mesh as an NLP
    warmstart (cf. ocpsol_to_nlpsol, ocp_to_nlp.hpp:515-554).

    With ``multipliers=False`` (default) returns the primal vector only.
    With ``multipliers=True`` returns ``(z, lam)``: the density multiplier
    interpolants ``lam_dyn``/``lam_cr`` are sampled at the new mesh's nodes
    and re-scaled by ITS per-row scaling ``w_scaling * w_i``, and
    ``lam_q``/``lam_ce`` carry over directly — the full constraint-multiplier
    rebuild the reference performs (ocp_to_nlp.hpp:536-549; bound multipliers
    zl/zu restart at zero there too, ocp_to_nlp.hpp:551-552).  Warmstarting
    the SQP with this ``lam`` is what makes cross-mesh re-solves converge in
    the same few iterations as same-mesh ones (test_ocp_ipopt.cpp:129)."""
    lay = nlp_layout(ocp, mesh)
    tf = jnp.asarray(ocpsol.tf, dtype)
    taus = jnp.asarray(np.asarray(mesh.all_nodes()), dtype)
    X = jax.vmap(lambda s: ocpsol.x(s * tf))(taus)
    U = jax.vmap(lambda s: ocpsol.u(s * tf))(taus[: lay.N])
    q = ocpsol.q if ocpsol.q is not None else jnp.zeros((lay.nq,), dtype)
    z = jnp.concatenate(
        [tf[None], jnp.asarray(q, dtype), X.ravel().astype(dtype), U.ravel().astype(dtype)]
    )
    if not multipliers:
        return z

    s_new = node_scalings(mesh, dtype)  # (N,)
    zeros = lambda k: jnp.zeros((k,), dtype)
    lam_d = (
        s_new[:, None]
        * jax.vmap(lambda s: ocpsol.lam_dyn(s * tf))(taus[: lay.N])
        if ocpsol.lam_dyn is not None
        else zeros(lay.N * lay.nx).reshape(lay.N, lay.nx)
    )
    lam_cr = (
        s_new[:, None]
        * jax.vmap(lambda s: ocpsol.lam_cr(s * tf))(taus[: lay.N])
        if ocpsol.lam_cr is not None
        else zeros(lay.N * lay.ncr).reshape(lay.N, lay.ncr)
    )
    lam_q = ocpsol.lam_q if ocpsol.lam_q is not None else zeros(lay.nq)
    lam_ce = ocpsol.lam_ce if ocpsol.lam_ce is not None else zeros(lay.nce)
    lam = jnp.concatenate(
        [
            lam_d.ravel().astype(dtype),
            jnp.asarray(lam_q, dtype),
            lam_cr.ravel().astype(dtype),
            jnp.asarray(lam_ce, dtype),
        ]
    )
    return z, lam
