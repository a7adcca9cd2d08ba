"""Cubic splines on Lie groups.

Fills the role of the upstream ``smooth::Spline`` / ``fit_spline_cubic`` used
by the reference PID (pid.hpp:142-159): a piecewise-cubic trajectory through
knot poses, evaluable together with body velocity and acceleration.

Construction is Catmull-Rom style (C^1): knot body velocities come from
central differences of the right-logarithms; each segment is a cubic Hermite
polynomial p(s) in the tangent space at the left knot,

    g(t) = g_i (+) p(s),        s = (t - t_i) / h_i,

with endpoint derivatives chosen so the *body velocity*
``v = dr_exp(p) p'(s) / h`` matches the knot velocities (the chart change at
the right endpoint uses ``p'(1) = h dr_expinv(delta) v_{i+1}``).  Velocity and
acceleration at arbitrary times are obtained by time-autodiff of the position
— exact for the spline itself, and jit/vmap compatible.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..groups.base import LieGroup


class LieSpline(NamedTuple):
    ts: np.ndarray  # (K,) knot times (static)
    gs: jax.Array  # (K, nparams) knot poses
    deltas: jax.Array  # (K-1, ndof)  log(g_i^{-1} g_{i+1})
    m0: jax.Array  # (K-1, ndof)  p'(0) per segment
    m1: jax.Array  # (K-1, ndof)  p'(1) per segment


def fit_spline(G: LieGroup, ts: Sequence[float], gs: jax.Array) -> LieSpline:
    """Fit a C^1 cubic through knot poses ``gs`` at times ``ts``
    (role of smooth::fit_spline_cubic)."""
    ts = np.asarray(ts, dtype=float)
    K = len(ts)
    if K < 2:
        raise ValueError("need at least two knots")
    hs = jnp.asarray(np.diff(ts))

    deltas = jax.vmap(G.rminus)(gs[1:], gs[:-1])  # (K-1, ndof), tangent at g_i

    # knot body velocities: central differences of the local logs
    v_seg = deltas / hs[:, None]  # mean body velocity per segment
    if K == 2:
        vs = jnp.concatenate([v_seg, v_seg], axis=0)
    else:
        v_mid = 0.5 * (v_seg[:-1] + v_seg[1:])
        vs = jnp.concatenate([v_seg[:1], v_mid, v_seg[-1:]], axis=0)  # (K, ndof)

    # Hermite endpoint derivatives in each segment's chart
    m0 = hs[:, None] * vs[:-1]
    m1 = hs[:, None] * jax.vmap(lambda d, v: G.dr_expinv(d) @ v)(deltas, vs[1:])
    return LieSpline(ts=ts, gs=gs, deltas=deltas, m0=m0, m1=m1)


def spline_pos(G: LieGroup, sp: LieSpline, t):
    """Evaluate the spline position at (traced) time ``t``."""
    ts = jnp.asarray(sp.ts)
    K = len(sp.ts)
    t = jnp.clip(t, sp.ts[0], sp.ts[-1])
    i = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, K - 2)
    h = ts[i + 1] - ts[i]
    s = (t - ts[i]) / h

    d = sp.deltas[i]
    m0 = sp.m0[i]
    m1 = sp.m1[i]
    # cubic Hermite with p(0)=0, p(1)=d, p'(0)=m0, p'(1)=m1
    s2, s3 = s * s, s * s * s
    h00 = 2 * s3 - 3 * s2 + 1
    h10 = s3 - 2 * s2 + s
    h01 = -2 * s3 + 3 * s2
    h11 = s3 - s2
    p = h10 * m0 + h01 * d + h11 * m1  # h00 multiplies p(0) = 0
    g0 = sp.gs[i]
    return G.rplus(g0, p)


def spline_eval(G: LieGroup, sp: LieSpline, t):
    """Evaluate ``(g, body velocity, body acceleration)`` at time ``t``
    (the PID trajectory interface, pid.hpp:43)."""
    t = jnp.asarray(t, dtype=jnp.result_type(sp.deltas))
    g = spline_pos(G, sp, t)

    def vel(tt):
        h0 = jnp.zeros_like(tt)
        return jax.jacfwd(
            lambda h: G.rminus(spline_pos(G, sp, tt + h), spline_pos(G, sp, tt))
        )(h0)

    v = vel(t)
    a = jax.jacfwd(vel)(t)
    return g, v, a
