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
