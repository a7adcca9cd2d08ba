"""Cubic splines on Lie groups.

Fills the role of the upstream ``smooth::Spline`` / ``fit_spline_cubic`` used
by the reference PID (pid.hpp:142-159): a piecewise-cubic trajectory through
knot poses, evaluable together with body velocity and acceleration.

Each segment is a cubic Hermite polynomial p(s) in the tangent space at the
left knot,

    g(t) = g_i (+) p(s),        s = (t - t_i) / h_i,

with endpoint derivatives chosen so the *body velocity*
``v = dr_exp(p) p'(s) / h`` matches prescribed knot velocities (the chart
change at the right endpoint uses ``p'(1) = h dr_expinv(delta) v_{i+1}``).
This gives C^1 for any knot velocities.

``fit_spline`` chooses the knot velocities:

* ``c2=False``: Catmull-Rom style central differences (C^1).
* ``c2=True`` (default): Newton iteration driving the body-acceleration jumps
  at interior knots to zero with natural end conditions (a = 0 at both ends)
  — the Lie-group analog of the reference's C^2 cubic fit, with the chart
  Jacobians handled exactly by autodiff.

Velocity and acceleration at arbitrary times come from time-autodiff of the
position — exact for the spline itself, jit/vmap compatible.
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


def _spline_from_velocities(G: LieGroup, ts, gs, deltas, vs) -> LieSpline:
    hs = jnp.asarray(np.diff(np.asarray(ts)))
    m0 = hs[:, None] * vs[:-1]
    m1 = hs[:, None] * jax.vmap(lambda d, v: G.dr_expinv(d) @ v)(deltas, vs[1:])
    return LieSpline(ts=np.asarray(ts, dtype=float), gs=gs, deltas=deltas, m0=m0, m1=m1)


def _catmull_rom_velocities(deltas, hs):
    v_seg = deltas / hs[:, None]
    K = deltas.shape[0] + 1
    if K == 2:
        return jnp.concatenate([v_seg, v_seg], axis=0)
    v_mid = 0.5 * (v_seg[:-1] + v_seg[1:])
    return jnp.concatenate([v_seg[:1], v_mid, v_seg[-1:]], axis=0)


def fit_spline(
    G: LieGroup,
    ts: Sequence[float],
    gs: jax.Array,
    c2: bool = True,
    newton_iters: int = 8,
) -> LieSpline:
    """Fit a cubic through knot poses ``gs`` at times ``ts``
    (role of smooth::fit_spline_cubic).  ``c2=True`` enforces continuous body
    acceleration at interior knots with natural end conditions."""
    # Newton on the acceleration-jump residuals needs full-precision matmuls
    # on TPU (bf16 default would stall the 1e-10 convergence check)
    with jax.default_matmul_precision("highest"):
        return _fit_spline_impl(G, ts, gs, c2, newton_iters)


def _fit_spline_impl(G, ts, gs, c2, newton_iters):
    ts = np.asarray(ts, dtype=float)
    K = len(ts)
    if K < 2:
        raise ValueError("need at least two knots")
    hs = jnp.asarray(np.diff(ts))
    deltas = jax.vmap(G.rminus)(gs[1:], gs[:-1])  # (K-1, ndof), tangent at g_i

    vs = _catmull_rom_velocities(deltas, hs)
    if not c2 or K == 2:
        return _spline_from_velocities(G, ts, gs, deltas, vs)

    nd = G.ndof

    def seg_accel(d, m0, m1, h, s):
        """Body acceleration of one segment at local parameter s (exact)."""

        def p(sv):
            s2 = sv * sv
            s3 = s2 * sv
            return (s3 - 2 * s2 + sv) * m0 + (-2 * s3 + 3 * s2) * d + (s3 - s2) * m1

        def v(sv):
            return (G.dr_exp(p(sv)) @ jax.jacfwd(p)(sv)) / h

        return jax.jacfwd(v)(s) / h

    hs_j = hs

    def residual(vs_flat):
        vs_ = vs_flat.reshape(K, nd)
        m0 = hs_j[:, None] * vs_[:-1]
        m1 = hs_j[:, None] * jax.vmap(lambda d, v: G.dr_expinv(d) @ v)(deltas, vs_[1:])
        a_at = jax.vmap(seg_accel, in_axes=(0, 0, 0, 0, None))
        a_left = a_at(deltas, m0, m1, hs_j, 1.0)  # (K-1, nd): end of each segment
        a_right = a_at(deltas, m0, m1, hs_j, 0.0)  # (K-1, nd): start of each segment
        jumps = a_right[1:] - a_left[:-1]  # interior knots (K-2, nd)
        return jnp.concatenate([a_right[0], jumps.reshape(-1), a_left[-1]])

    res_jac = jax.jit(jax.jacfwd(residual))
    res_fn = jax.jit(residual)

    x = vs.reshape(-1)
    for _ in range(newton_iters):
        r = res_fn(x)
        if float(jnp.max(jnp.abs(r))) < 1e-10:
            break
        J = res_jac(x)
        dx = jnp.linalg.solve(J + 1e-10 * jnp.eye(J.shape[0]), -r)
        x = x + dx

    return _spline_from_velocities(G, ts, gs, deltas, x.reshape(K, nd))


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
