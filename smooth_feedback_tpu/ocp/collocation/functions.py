"""JAX evaluation of functions over a collocation mesh.

TPU-native replacement for the reference's mesh_function.hpp: where the
reference hand-assembles sparse Jacobians/Hessians with manual chain rules
(mesh_function.hpp:114-664), here every mesh operation is an ordinary JAX
function of the stacked node values — derivatives come from ``jax.jacfwd`` /
``jax.jacrev`` applied to these functions, and XLA sees dense batched einsums
that map onto the MXU.

Shapes: for a mesh with N collocation nodes,
  * ``X`` holds state (tangent) values at the N+1 node points: (N+1, nx)
  * ``U`` holds input values at the N collocation points: (N, nu)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import (
    Mesh,
    bary_weights_colloc,
    bary_weights_plus_one,
    diffmat_local,
    intmat_local,
    lgr_nodes,
    lgr_plus_one,
)


def mesh_eval(mesh: Mesh, fn: Callable, t0, tf, X, U):
    """Stack ``fn(t_i, x_i, u_i)`` over all N collocation nodes
    (cf. mesh_eval, mesh_function.hpp:114-246). Returns (N, nf)."""
    taus = jnp.asarray(mesh.all_nodes()[:-1])
    ts = t0 + (tf - t0) * taus
    return jax.vmap(fn)(ts, X[:-1], U)


def mesh_integrate(mesh: Mesh, fn: Callable, t0, tf, X, U):
    """Quadrature ``sum_i w_i (tf - t0) fn(t_i, x_i, u_i)``
    (cf. mesh_integrate, mesh_function.hpp:273-419). Returns (nf,)."""
    w = jnp.asarray(mesh.all_weights()[:-1])
    vals = mesh_eval(mesh, fn, t0, tf, X, U)
    with jax.default_matmul_precision("highest"):  # TPU: no bf16 quadrature
        return (tf - t0) * jnp.einsum("i,i...->...", w, vals)


def global_diffmat(mesh: Mesh) -> np.ndarray:
    """Static dense (N, N+1) differentiation matrix of the whole mesh:
    ``dX/dtau at the N collocation nodes = global_diffmat(mesh) @ X``.

    Block-banded (one block per interval), built once on the host — the
    collocation derivative becomes a single static matmul, which both the MXU
    and the XLA compiler strongly prefer over per-interval scatters."""
    N = mesh.N_colloc
    Dfull = np.zeros((N, N + 1))
    offsets = mesh.interval_offsets()
    for ival in range(mesh.N_ivals):
        K = mesh.N_colloc_ival(ival)
        alpha, Dloc = mesh.interval_diffmat_unscaled(ival)  # Dloc: (K+1, K)
        o = int(offsets[ival])
        Dfull[o : o + K, o : o + K + 1] += alpha * Dloc.T
    return Dfull


def mesh_dyn(mesh: Mesh, f: Callable, t0, tf, X, U, weighted: bool = True):
    """Collocation dynamics defects at all N nodes
    (cf. mesh_dyn, mesh_function.hpp:452-664). Returns (N, nx):

        d_i = w_i * ( (tf - t0) f(t_i, x_i, u_i) - dX/dtau (tau_i) )

    with ``w_i`` quadrature weights if ``weighted`` (reference behavior).
    """
    F = mesh_eval(mesh, f, t0, tf, X, U)  # (N, nx)
    with jax.default_matmul_precision("highest"):  # TPU: no bf16 defects
        dX = jnp.asarray(global_diffmat(mesh), dtype=X.dtype) @ X  # (N, nx)

    defect = (tf - t0) * F - dX
    if weighted:
        w = jnp.asarray(mesh.all_weights()[:-1])
        defect = w[:, None] * defect
    return defect


def mesh_dyn_error(mesh: Mesh, f: Callable, t0, tf, xfun: Callable, ufun: Callable):
    """Per-interval relative dynamics error (cf. dyn_error.hpp:28-74).

    ``xfun(t) -> (nx,)`` and ``ufun(t) -> (nu,)`` are trajectory callables
    (typically interpolants of a solution on a *different* mesh).
    Returns (N_ivals,).
    """
    with jax.default_matmul_precision("highest"):  # drives refinement: exact
        return _mesh_dyn_error_impl(mesh, f, t0, tf, xfun, ufun)


def _mesh_dyn_error_impl(mesh, f, t0, tf, xfun, ufun):
    errs = []
    for i in range(mesh.N_ivals):
        K = mesh.N_colloc_ival(i)
        taus = jnp.asarray(mesh.interval_nodes(i))  # (K+1,)
        ts = t0 + (tf - t0) * taus
        Xval = jax.vmap(xfun)(ts)  # (K+1, nx)
        Uval = jax.vmap(ufun)(ts)
        Fval = jax.vmap(f)(ts, Xval, Uval)  # (K+1, nx)
        Imat = jnp.asarray(mesh.interval_intmat(i))  # (K, K)
        # "integrate" the dynamics forward within the interval
        Xest = Xval[0][None, :] + (tf - t0) * jnp.einsum(
            "ik,kn->in", Imat.T, Fval[:K]
        )  # (K, nx)
        e_abs = jnp.linalg.norm(Xest - Xval[1:], axis=1)
        scale = 1.0 + jnp.max(jnp.linalg.norm(Xval[1:], axis=1))
        errs.append(jnp.max(e_abs / scale))
    return jnp.stack(errs)


# ------------------------------------------------------------- interpolation


def _bary_eval(tnodes: np.ndarray, wb: np.ndarray, vals, u):
    """Barycentric Lagrange evaluation at traced scalar ``u``; exact at nodes.

    Uses the *first* (modified-Lagrange) barycentric form
    ``p(u) = sum_k w_k prod_{j!=k}(u - t_j) v_k / sum_k w_k prod_{j!=k}(u - t_j)``,
    a plain polynomial expression in ``u`` with no removable singularity, so
    JAX derivatives w.r.t. ``u`` are correct everywhere *including at the
    nodes* (the second form's node short-circuit gave zero tangents there).
    Stable for the small K (<= Kmax+1) used per collocation interval."""
    tn = jnp.asarray(tnodes)
    w = jnp.asarray(wb)
    d = u - tn
    K = tn.shape[0]
    off_diag = ~np.eye(K, dtype=bool)
    # prods[k] = prod_{j != k} (u - t_j)
    prods = jnp.prod(jnp.where(off_diag, d[None, :], jnp.ones((), d.dtype)), axis=1)
    lw = w * prods
    num = jnp.einsum("k,k...->...", lw, vals)
    den = jnp.sum(lw)
    return num / den


def mesh_interp(mesh: Mesh, values, tau, extend: bool = True, deriv: int = 0):
    """Evaluate the mesh polynomial defined by node ``values`` at ``tau``
    (cf. Mesh::eval, mesh.hpp:433-471).

    ``values`` has shape (N+1, d) if ``extend`` else (N, d); ``tau`` is a
    traced scalar in [0, 1] (clamped outside).  ``deriv`` is any order >= 0
    (like the reference's template parameter; orders beyond the local
    polynomial degree return 0).
    """
    if deriv < 0:
        raise ValueError("deriv must be >= 0")
    with jax.default_matmul_precision("highest"):  # TPU: exact interpolants
        return _mesh_interp_impl(mesh, values, tau, extend, deriv)


def _mesh_interp_impl(mesh: Mesh, values, tau, extend: bool, deriv: int):
    taus0 = np.asarray([t for _, t in mesh.intervals])
    tau = jnp.clip(tau, 0.0, 1.0)
    ival = jnp.clip(
        jnp.searchsorted(jnp.asarray(taus0), tau, side="right") - 1, 0, mesh.N_ivals - 1
    )
    offsets = mesh.interval_offsets()

    def make_branch(i):
        K, tau0 = mesh.intervals[i]
        tau0, tauf = mesh.interval_bounds(i)
        o = int(offsets[i])
        last = i == mesh.N_ivals - 1
        use_short = last and not extend  # no value at the final node

        def branch(_):
            u = (tau - tau0) / (tauf - tau0)
            if use_short:
                tn, _ = lgr_nodes(K)
                wb = bary_weights_colloc(K)
                vals = values[o : o + K]
            else:
                tn, _ = lgr_plus_one(K)
                wb = bary_weights_plus_one(K)
                vals = values[o : o + K + 1]
            if deriv == 0:
                return _bary_eval(tn, wb, vals, u)
            # derivative values at the K collocation nodes, then interp.
            # Higher orders chain host-side differentiation matrices: the
            # first application maps (K+1)-node values onto the K LGR nodes
            # (degree K-1 space), further orders stay in that space via the
            # K x K collocation diffmat — all assembled into ONE static
            # matrix on the host (reference Mesh::eval is likewise templated
            # on arbitrary derivative order, mesh.hpp:433-471).
            Dc = np.asarray(_colloc_diffmat(K))
            if use_short:
                # degree K-1 polynomial on the K LGR nodes
                D = np.linalg.matrix_power(Dc, deriv)
            else:
                D = diffmat_local(K)  # (K+1, K) local first derivative
                D = D @ np.linalg.matrix_power(Dc, deriv - 1)
            dvals = jnp.einsum("jk,j...->k...", jnp.asarray(D), vals)
            tdn = lgr_nodes(K)[0]
            wdn = bary_weights_colloc(K)
            out = _bary_eval(tdn, wdn, dvals, u)
            return out / (tauf - tau0) ** deriv  # chain rule to [0,1] scale

        return branch

    branches = [make_branch(i) for i in range(mesh.N_ivals)]
    if len(branches) == 1:
        return branches[0](None)
    return jax.lax.switch(ival, branches, None)


def _colloc_diffmat(K: int) -> np.ndarray:
    """(K, K) derivative matrix over the K LGR nodes (degree K-1 basis)."""
    t, _ = lgr_nodes(K)
    w = 1.0 / np.array(
        [np.prod([t[j] - t[k] for k in range(K) if k != j]) for j in range(K)]
    )
    Dfull = np.zeros((K, K))
    for i in range(K):
        for j in range(K):
            if i != j:
                Dfull[i, j] = (w[j] / w[i]) / (t[i] - t[j])
        Dfull[i, i] = -np.sum(Dfull[i, :])
    return Dfull.T.copy()  # (K, K): column i = derivative at t_i
