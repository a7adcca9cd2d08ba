"""Dense derivative-combination helpers.

The reference's sparse block utilities (utils/sparse.hpp) mostly disappear in
a dense-array design; the one mathematical utility worth keeping is the
Hessian-of-composition rule ``d2r_fog`` (utils/sparse.hpp:210-245), expressed
here as einsums over dense stacked Hessians.
"""

from __future__ import annotations

import jax.numpy as jnp


def d2r_fog(Jf, Hf, Jg, Hg):
    """Hessian of the composition ``f o g`` from the parts.

    Args (dense layouts):
      Jf: (No, Ny)       Jacobian of f at g(x)
      Hf: (No, Ny, Ny)   Hessians of each output of f
      Jg: (Ny, Nx)       Jacobian of g at x
      Hg: (Ny, Nx, Nx)   Hessians of each output of g

    Returns (No, Nx, Nx):  H_k = Jg' Hf_k Jg + sum_j Jf[k, j] Hg_j
    (the dense form of the reference's hstacked-Hessian accumulation).
    """
    first = jnp.einsum("yx,kyz,zw->kxw", Jg, Hf, Jg)
    second = jnp.einsum("ky,yxw->kxw", Jf, Hg)
    return first + second


# ---------------------------------------------------------------------------
# Batch-trailing ("lane") stack linear algebra
# ---------------------------------------------------------------------------
#
# TPU arrays tile their two minor dims to (8 sublanes, 128 lanes): a batched
# stack of tiny matrices in the natural (B, n, n) layout pads n -> 128 lanes
# (~110x memory waste at n=3) and every op on it is bandwidth-crippled.  The
# helpers below operate on (n, n, B)-shaped stacks — the BATCH rides the
# lanes — using broadcast-multiply-sum only (never dot_general, which XLA
# would re-layout).  Used by the EKF fleet layout (estimators/ekf.py) and the
# QP solver's "lane" backend (qp/solver.py).


def mm_lane(A, B):
    """(i,j,b),(j,k,b) -> (i,k,b) matrix-stack product, batch trailing."""
    return (A[:, :, None, :] * B[None, :, :, :]).sum(axis=1)


def mv_lane(A, x):
    """(i,j,b),(j,b) -> (i,b) matvec stack, batch trailing."""
    return (A * x[None, :, :]).sum(axis=1)


def sym_lane(P):
    return 0.5 * (P + jnp.swapaxes(P, 0, 1))


def chol_lane(S):
    """Unrolled lower Cholesky of an SPD (m, m, B) stack (m static, small).

    Python-unrolled over the matrix indices — O(m^3) traced (B,)-vector ops,
    intended for m up to ~16."""
    m = S.shape[0]
    L = [[None] * m for _ in range(m)]
    for j in range(m):
        acc = S[j, j]
        for k in range(j):
            acc = acc - L[j][k] * L[j][k]
        d = jnp.sqrt(acc)
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, m):
            acc = S[i, j]
            for k in range(j):
                acc = acc - L[i][k] * L[j][k]
            L[i][j] = acc * inv_d
    z = jnp.zeros_like(S[0, 0])
    return jnp.stack(
        [jnp.stack([L[i][j] if j <= i else z for j in range(m)]) for i in range(m)]
    )


def chol_solve_lane(L, B):
    """Solve (L L') X = B with (m, m, B)-stack lower-triangular L, (m, k, B) B."""
    m = B.shape[0]
    Y = [None] * m
    for i in range(m):
        acc = B[i]
        for j in range(i):
            acc = acc - L[i, j][None, :] * Y[j]
        Y[i] = acc / L[i, i][None, :]
    X = [None] * m
    for i in reversed(range(m)):
        acc = Y[i]
        for j in range(i + 1, m):
            acc = acc - L[j, i][None, :] * X[j]
        X[i] = acc / L[i, i][None, :]
    return jnp.stack(X)


def qr_lower_lane(M):
    """Lower-triangular stack T with ``T T' = M M'`` for (r, c, B) stacks.

    The batch-trailing analog of the square-root filters' ``_qr_lower``
    (thin-QR of M'): an unrolled Householder QR over the static (r, c) dims
    with all arithmetic on (B,)-lane vectors, so the conditioning advantage
    of the array form is preserved (no Gram matrix is ever formed).
    Sign-normalized to a non-negative diagonal."""
    r, c, B = M.shape
    A = jnp.swapaxes(M, 0, 1)  # (c, r, B) — QR of M'
    eps = jnp.finfo(A.dtype).tiny
    for k in range(r):
        x = A[k:, k]  # (c-k, B)
        normx = jnp.sqrt((x * x).sum(axis=0))
        sign = jnp.where(A[k, k] >= 0, 1.0, -1.0)
        alpha = -sign * normx
        v = x.at[0].add(-alpha)  # x - alpha e1
        vnorm2 = (v * v).sum(axis=0)
        degenerate = vnorm2 <= eps
        beta = jnp.where(degenerate, 0.0, 2.0 / jnp.where(degenerate, 1.0, vnorm2))
        for j in range(k, r):
            w = (v * A[k:, j]).sum(axis=0)  # (B,)
            A = A.at[k:, j].add(-beta[None, :] * w[None, :] * v)
    R = A[:r]  # (r, r, B) upper-triangular (numerically)
    s = jnp.sign(jnp.where(
        jnp.stack([R[i, i] for i in range(r)]) == 0,
        1.0,
        jnp.stack([R[i, i] for i in range(r)]),
    ))  # (r, B)
    Rn = R * s[:, None, :]
    T = jnp.swapaxes(Rn, 0, 1)  # lower
    # zero the strict upper part (roundoff dust above the diagonal)
    mask = jnp.tril(jnp.ones((r, r), dtype=M.dtype))[:, :, None]
    return T * mask
