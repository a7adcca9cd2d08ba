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


def _check_first_second(fn_c, ndof, eps, label, second_order):
    """First- and second-order FD consistency of a chart map ``w -> fn_c(w)``
    around w = 0 (the reference validates both jacobians and hessians,
    ocp.hpp:165-338)."""
    z = jnp.zeros(ndof)
    J = jax.jacfwd(fn_c)(z)
    assert bool(jnp.isfinite(jnp.asarray(J)).all()), f"non-finite d{label}"
    for d in range(ndof):
        e = z.at[d].set(eps)
        fd = (fn_c(e) - fn_c(-e)) / (2 * eps)
        np.testing.assert_allclose(
            jnp.asarray(J)[..., d], fd, atol=1e-4, rtol=1e-4, err_msg=f"d{label}"
        )
    if not second_order:
        return
    Jfun = jax.jacfwd(fn_c)
    H = jax.jacfwd(Jfun)(z)
    assert bool(jnp.isfinite(jnp.asarray(H)).all()), f"non-finite d2{label}"
    feps = float(eps) ** 0.5  # FD of an exact jacobian: larger step is stabler
    for d in range(ndof):
        e = z.at[d].set(feps)
        fd = (Jfun(e) - Jfun(-e)) / (2 * feps)
        np.testing.assert_allclose(
            jnp.asarray(H)[..., d], fd, atol=1e-3, rtol=1e-3, err_msg=f"d2{label}"
        )
    # symmetry of the mixed partials (a cheap state-bug detector)
    Ha = jnp.asarray(H)
    np.testing.assert_allclose(Ha, jnp.swapaxes(Ha, -1, -2), atol=1e-9, err_msg=label)


def test_ocp_derivatives(
    ocp: OCP,
    key: jax.Array,
    num: int = 3,
    eps: float = 1e-6,
    second_order: bool = True,
):
    """Self-check utility in the spirit of the reference's
    ``test_ocp_derivatives`` (ocp.hpp:165-338): verifies that autodiff
    first- AND second-order derivatives of the user's callables are finite
    and consistent with finite differences at random points.  Raises
    AssertionError on failure.  Like the reference's usage
    (tests/test_ocp_flatten.cpp:53-59), call twice to catch hidden state."""
    X, U = ocp.X, ocp.U
    nq = ocp.nq
    for i in range(num):
        key, k1, k2, k3 = jax.random.split(key, 4)
        t = jax.random.uniform(k1, ())
        x = X.random(k2, 0.5)
        u = U.random(k3, 0.5)
        q = jax.random.normal(key, (nq,))

        # dynamics / running-cost / running-constraint charts in (x, u)
        for fn, label in ((ocp.f, "f"), (ocp.g, "g"), (ocp.cr, "cr")):
            val = fn(t, x, u)
            assert bool(jnp.isfinite(jnp.asarray(val)).all()), f"non-finite {label}"

            def chart(w, fn=fn):
                return fn(t, X.rplus(x, w[: X.ndof]), U.rplus(u, w[X.ndof :]))

            _check_first_second(chart, X.ndof + U.ndof, eps, label, second_order)

        # endpoint functions: chart in (x0, xf, q)
        for fn, label in ((ocp.theta, "theta"), (ocp.ce, "ce")):
            val = fn(t, x, x, q)
            assert bool(jnp.isfinite(jnp.asarray(val)).all()), f"non-finite {label}"

            def chart(w, fn=fn):
                return fn(
                    t,
                    X.rplus(x, w[: X.ndof]),
                    X.rplus(x, w[X.ndof : 2 * X.ndof]),
                    q + w[2 * X.ndof :],
                )

            _check_first_second(chart, 2 * X.ndof + nq, eps, label, second_order)
