"""Lie group abstraction for TPU-native control and estimation.

This is the L0 layer of the framework: a minimal, fixed-shape, jit/vmap
compatible replacement for the subset of the ``pettni/smooth`` C++ library used
by the reference (``/root/reference/include/smooth/feedback``; see e.g.
mpc.hpp:7-8, ekf.hpp:5-9 for the upstream symbols consumed there).

Design (TPU-first, not a translation):

* A group *element* is a plain ``jax.Array`` of static shape ``(nparams,)``;
  a *tangent* vector is a ``jax.Array`` of shape ``(ndof,)``.  Because elements
  are raw arrays, every operation trivially composes with ``jax.vmap``,
  ``jax.jit``, ``jax.lax.scan`` and sharding — batches of group elements are
  just leading axes.
* A :class:`LieGroup` instance is a stateless, hashable description of the
  group (suitable as a jit-static argument).  All math lives in pure
  functions/methods over arrays.
* Generic fallbacks for the right Jacobians (``dr_exp``/``dr_expinv``), the
  adjoints (``Ad``/``ad``) and second-order derivatives are derived from
  ``exp``/``log``/``compose`` via ``jax.jacfwd`` using the identities

      dr_exp(v)    = d/dw log( exp(v)^{-1} o exp(v + w) ) |_{w=0}
      dr_expinv(v) = d/dw log( exp(v) o exp(w) )          |_{w=0}
      Ad(g)        = d/dw log( g o exp(w) o g^{-1} )      |_{w=0}
      ad(v)        = d/ds Ad( exp(s v) )                  |_{s=0}

  so concrete groups only *must* implement exp/log/compose/inverse; closed
  forms override the fallbacks where profitable.  Correctness of overrides is
  pinned by tests comparing against the autodiff fallbacks (the pattern of the
  reference's derivative self-check, ocp.hpp:165-338).

Conventions follow the reference (right-trivialized / "body-frame"):

* ``rplus(x, v) = x o exp(v)`` and ``rminus(a, b) = log(b^{-1} o a)``.
* ``Ad(g)`` satisfies ``g o exp(v) o g^{-1} = exp(Ad(g) v)``.
* ``ad(v) = d/ds Ad(exp(s v))|_0`` (so ``Ad(exp(v)) = expm(ad(v))``).
* ``dr_exp`` is the right Jacobian: ``exp(v + dv) ~ exp(v) o exp(dr_exp(v) dv)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class LieGroup:
    """Stateless description of a Lie group; elements are flat arrays.

    Subclasses must set ``nparams``/``ndof`` and implement
    ``identity``/``exp``/``log``/``compose``/``inverse``.
    """

    nparams: int
    ndof: int

    # ------------------------------------------------------------------ core
    def identity(self, dtype=None) -> jax.Array:
        raise NotImplementedError

    def exp(self, v: jax.Array) -> jax.Array:
        raise NotImplementedError

    def log(self, g: jax.Array) -> jax.Array:
        raise NotImplementedError

    def compose(self, a: jax.Array, b: jax.Array) -> jax.Array:
        raise NotImplementedError

    def inverse(self, g: jax.Array) -> jax.Array:
        raise NotImplementedError

    # ------------------------------------------------------------ derived ops
    def rplus(self, g: jax.Array, v: jax.Array) -> jax.Array:
        """Right-plus: ``g (+) v = g o exp(v)``."""
        return self.compose(g, self.exp(v))

    def rminus(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Right-minus: ``a (-) b = log(b^{-1} o a)`` (tangent at ``b``)."""
        return self.log(self.compose(self.inverse(b), a))

    def lplus(self, g: jax.Array, v: jax.Array) -> jax.Array:
        """Left-plus: ``v (+) g = exp(v) o g``."""
        return self.compose(self.exp(v), g)

    def lminus(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """Left-minus: ``log(a o b^{-1})``."""
        return self.log(self.compose(a, self.inverse(b)))

    # ------------------------------------------------- adjoints and Jacobians
    def Ad(self, g: jax.Array) -> jax.Array:
        """Adjoint matrix of a group element, shape ``(ndof, ndof)``."""
        z = jnp.zeros((self.ndof,), dtype=g.dtype)
        return jax.jacfwd(
            lambda w: self.log(self.compose(self.compose(g, self.exp(w)), self.inverse(g)))
        )(z)

    def ad(self, v: jax.Array) -> jax.Array:
        """Adjoint matrix of a tangent element (Lie bracket ``ad_v w = [v, w]``)."""
        s = jnp.zeros((), dtype=v.dtype)
        return jax.jacfwd(lambda t: self.Ad(self.exp(t * v)))(s)

    def dr_exp(self, v: jax.Array) -> jax.Array:
        """Right Jacobian of ``exp`` at ``v``, shape ``(ndof, ndof)``."""
        z = jnp.zeros_like(v)
        return jax.jacfwd(
            lambda w: self.log(self.compose(self.inverse(self.exp(v)), self.exp(v + w)))
        )(z)

    def dr_expinv(self, v: jax.Array) -> jax.Array:
        """Inverse of the right Jacobian of ``exp`` at ``v``."""
        z = jnp.zeros_like(v)
        return jax.jacfwd(lambda w: self.log(self.compose(self.exp(v), self.exp(w))))(z)

    def dl_exp(self, v: jax.Array) -> jax.Array:
        """Left Jacobian: ``dl_exp(v) = Ad(exp(v)) dr_exp(v)``."""
        return self.Ad(self.exp(v)) @ self.dr_exp(v)

    def dl_expinv(self, v: jax.Array) -> jax.Array:
        """Inverse left Jacobian."""
        return self.dr_expinv(v) @ self.Ad(self.inverse(self.exp(v)))

    # Second-order derivatives (for flatten Hessians, ocp_flatten.hpp:221-277
    # in the reference; here obtained by one extra forward-mode sweep).
    def d2r_exp(self, v: jax.Array) -> jax.Array:
        """``d/dv dr_exp(v)`` with shape ``(ndof, ndof, ndof)``."""
        return jax.jacfwd(self.dr_exp)(v)

    def d2r_expinv(self, v: jax.Array) -> jax.Array:
        """``d/dv dr_expinv(v)`` with shape ``(ndof, ndof, ndof)``."""
        return jax.jacfwd(self.dr_expinv)(v)

    # ---------------------------------------------------------------- helpers
    def random(self, key: jax.Array, scale: float = 1.0) -> jax.Array:
        """Random element ``exp(scale * n)``, ``n ~ N(0, I)`` (for tests)."""
        v = scale * jax.random.normal(key, (self.ndof,))
        return self.exp(v)

    def normalize(self, g: jax.Array) -> jax.Array:
        """Project parameters back onto the group manifold (e.g. unit norm)."""
        return g

    def is_commutative(self) -> bool:
        return False

    # hashability: group descriptions are compared by type (and fields set by
    # subclasses); needed for use as jit-static arguments.
    def _key(self):
        return (type(self).__name__,)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, LieGroup) and self._key() == other._key()

    def __repr__(self):
        return type(self).__name__


def jacobian_wrt_group(group: LieGroup, f, g: jax.Array, *args, **kwargs):
    """Right (body-frame) derivative of ``f`` at the group element ``g``.

    Computes ``d/dw f(g o exp(w), *args)`` at ``w = 0`` — the JAX analog of the
    reference's ``diff::dr`` dispatcher applied to a group argument
    (e.g. mpc.hpp:142-151, ekf.hpp:86).  Returns ``(f(g), J)``.
    """
    z = jnp.zeros((group.ndof,), dtype=jnp.result_type(g))
    fn = lambda w: f(group.rplus(g, w), *args, **kwargs)
    return f(g, *args, **kwargs), jax.jacfwd(fn)(z)


def ad_generators(G, dtype=None) -> jax.Array:
    """(ndof, ndof, ndof) stack ``adgen[k] = ad(e_k)``.

    ``ad`` is linear in its tangent argument, so
    ``ad(v) = einsum('kij,k->ij', adgen, v)`` — and for batch-trailing fleet
    layouts ``ad`` of a (ndof, B) velocity stack assembles directly as
    ``einsum('kij,kb->ijb', adgen, v_t)`` without materializing padded
    (B, ndof, ndof) intermediates."""
    eye = jnp.eye(G.ndof, dtype=dtype)
    return jnp.stack([G.ad(eye[:, k]) for k in range(G.ndof)])
