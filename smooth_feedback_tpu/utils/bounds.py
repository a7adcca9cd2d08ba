"""Manifold bounds set (cf. reference common.hpp:17-30):

    { m : l <= A * (m (-) c) <= u }

described by a matrix A, a center group element c, and bounds l/u.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..groups.base import LieGroup


class ManifoldBounds(NamedTuple):
    A: jax.Array  # (nb, ndof)
    c: jax.Array  # (nparams,) group element
    l: jax.Array  # (nb,)
    u: jax.Array  # (nb,)


def empty_bounds(G: LieGroup, dtype=None) -> ManifoldBounds:
    return ManifoldBounds(
        A=jnp.zeros((0, G.ndof), dtype),
        c=G.identity(dtype),
        l=jnp.zeros((0,), dtype),
        u=jnp.zeros((0,), dtype),
    )


def box_bounds(G: LieGroup, lo, hi, dtype=None) -> ManifoldBounds:
    """Axis-aligned bounds around the identity."""
    return ManifoldBounds(
        A=jnp.eye(G.ndof, dtype=dtype),
        c=G.identity(dtype),
        l=jnp.asarray(lo, dtype),
        u=jnp.asarray(hi, dtype),
    )
