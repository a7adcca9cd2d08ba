"""Optimal control problem definition.

TPU-native analog of the reference OCP struct (ocp.hpp:50-153).  The problem

    min    theta(tf, x0, xf, q)
    s.t.   d^r x_t = f(t, x, u)
           q = integral g(t, x, u) dt
           crl <= cr(t, x, u) <= cru
           cel <= ce(tf, x0, xf, q) <= ceu

is a plain Python container of jax-traceable callables plus the state/input
group descriptions.  It is captured in closures of the transcription factories
(ocp_to_qp / ocp_to_nlp) rather than passed through jit boundaries.

Where the reference requires user-supplied analytic Jacobians/Hessians for
speed (diff::Type::Analytic), here all derivatives come from ``jax.jacfwd`` /
``jax.hessian`` traced once at compile time — user functions never need to
provide derivatives.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..groups.base import LieGroup


class OCP(NamedTuple):
    """Optimal control problem on Lie groups (cf. reference ocp.hpp:50-99)."""

    X: LieGroup  # state group
    U: LieGroup  # input group (Rn for Euclidean inputs)
    theta: Callable  # (tf, x0, xf, q) -> scalar       endpoint cost
    f: Callable  # (t, x, u) -> (nx,)                  dynamics (body velocity)
    g: Callable  # (t, x, u) -> (nq,)                  running cost integrand
    cr: Callable  # (t, x, u) -> (ncr,)                running constraints
    crl: jax.Array  # (ncr,)
    cru: jax.Array  # (ncr,)
    ce: Callable  # (tf, x0, xf, q) -> (nce,)          end constraints
    cel: jax.Array  # (nce,)
    ceu: jax.Array  # (nce,)

    @property
    def nx(self) -> int:
        return self.X.ndof

    @property
    def nu(self) -> int:
        return self.U.ndof

    @property
    def nq(self) -> int:
        # infer from g at identity
        out = jax.eval_shape(
            self.g,
            jnp.zeros(()),
            self.X.identity(),
            self.U.identity(),
        )
        return int(out.shape[0])

    @property
    def ncr(self) -> int:
        return int(jnp.shape(self.crl)[0])

    @property
    def nce(self) -> int:
        return int(jnp.shape(self.cel)[0])


class OCPSolution(NamedTuple):
    """Solution trajectories (cf. reference OCPSolution, ocp.hpp:113-153).

    ``x``/``u`` are jax-traceable callables of time; multiplier callables are
    optional (populated by the NLP path)."""

    t0: float
    tf: jax.Array
    x: Callable  # t -> (nparams_x,)
    u: Callable  # t -> (nparams_u,)
    q: Optional[jax.Array] = None
    lam_q: Optional[jax.Array] = None
    lam_ce: Optional[jax.Array] = None
    lam_dyn: Optional[Callable] = None
    lam_cr: Optional[Callable] = None


def test_ocp_derivatives(ocp: OCP, key: jax.Array, num: int = 3, eps: float = 1e-6):
    """Self-check utility in the spirit of the reference's
    ``test_ocp_derivatives`` (ocp.hpp:165-338): verifies that autodiff
    derivatives of the user's callables are finite and consistent with finite
    differences at random points.  Raises AssertionError on failure."""
    X, U = ocp.X, ocp.U
    nq = ocp.nq
    for i in range(num):
        key, k1, k2, k3 = jax.random.split(key, 4)
        t = jax.random.uniform(k1, ())
        x = X.random(k2, 0.5)
        u = U.random(k3, 0.5)
        q = jax.random.normal(key, (nq,))

        # dynamics jacobian wrt tangent perturbation vs finite differences
        zx = jnp.zeros(X.ndof)
        J = jax.jacfwd(lambda w: ocp.f(t, X.rplus(x, w), u))(zx)
        assert bool(jnp.isfinite(J).all()), "non-finite df/dx"
        for d in range(X.ndof):
            e = zx.at[d].set(eps)
            fd = (ocp.f(t, X.rplus(x, e), u) - ocp.f(t, X.rplus(x, -e), u)) / (2 * eps)
            np.testing.assert_allclose(J[:, d], fd, atol=1e-4, rtol=1e-4)

        # endpoint functions
        for fn in (ocp.theta, ocp.ce):
            val = fn(t, x, x, q)
            assert bool(jnp.isfinite(jnp.asarray(val)).all())
            Jx = jax.jacfwd(lambda w: fn(t, X.rplus(x, w), x, q))(zx)
            assert bool(jnp.isfinite(jnp.asarray(Jx)).all())

        for fn in (ocp.g, ocp.cr):
            val = fn(t, x, u)
            assert bool(jnp.isfinite(val).all())
