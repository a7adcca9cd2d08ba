"""Taylor-guarded trigonometric coefficient functions.

The coefficient functions that appear in Lie-group exp/log/Jacobian closed
forms (sin(x)/x and friends) are singular at 0 when written naively.  Each
helper here is total and smooth: near zero it evaluates a truncated series and
the exact branch is computed on a "safe" input so reverse/forward-mode autodiff
never sees a NaN (the standard double-``where`` trick).

Series are accurate to machine epsilon in float64 for |x| below the cutoff.
"""

from __future__ import annotations

import jax.numpy as jnp

_CUT = 1e-2  # |x| cutoff between series and exact branch (f64)


def _cut(dtype):
    """Series/exact seam, dtype-aware.

    The exact branches cancel catastrophically near zero: their relative
    error grows like eps/x^2, so the seam must scale with the dtype's eps.
    In f32 the 3-4 term series are accurate to ~1e-9 relative out to x=0.5 —
    far below f32 eps — so the seam moves out to 0.5 there.
    """
    return 0.5 if jnp.finfo(dtype).bits <= 32 else _CUT


def _guard(x):
    small = jnp.abs(x) < _cut(x.dtype)
    safe = jnp.where(small, jnp.ones_like(x), x)
    return small, safe


def _safe_denom(d, eps=1e-12):
    """Clamp a denominator away from zero, preserving sign.

    The inverse-Jacobian coefficients have true poles at |theta| = 2*pi*k;
    clamping turns a NaN/inf there into a huge finite value, so optimizers
    that wander toward the pole see a steep barrier instead of NaN poison.
    """
    mag = jnp.maximum(jnp.abs(d), eps)
    sign = jnp.where(d >= 0, 1.0, -1.0)
    return sign * mag


def sinc(x):
    """sin(x) / x."""
    small, safe = _guard(x)
    x2 = x * x
    series = 1.0 - x2 / 6.0 * (1.0 - x2 / 20.0 * (1.0 - x2 / 42.0))
    return jnp.where(small, series, jnp.sin(safe) / safe)


def cos1c(x):
    """(1 - cos(x)) / x**2."""
    small, safe = _guard(x)
    x2 = x * x
    series = 0.5 * (1.0 - x2 / 12.0 * (1.0 - x2 / 30.0 * (1.0 - x2 / 56.0)))
    return jnp.where(small, series, (1.0 - jnp.cos(safe)) / (safe * safe))


def sin3c(x):
    """(x - sin(x)) / x**3."""
    small, safe = _guard(x)
    x2 = x * x
    series = (1.0 - x2 / 20.0 * (1.0 - x2 / 42.0 * (1.0 - x2 / 72.0))) / 6.0
    return jnp.where(small, series, (safe - jnp.sin(safe)) / (safe * safe * safe))


def jlinv2c(x):
    """1/x**2 - (1 + cos(x)) / (2 x sin(x)).

    The coefficient of the quadratic term in the inverse (left/right) SO(3)
    Jacobian: ``J^{-1} = I -+ hat/2 + jlinv2c(theta) hat^2``.
    """
    small, safe = _guard(x)
    x2 = x * x
    series = (1.0 + x2 / 60.0 * (1.0 + x2 / 42.0 * (1.0 + x2 / 40.0))) / 12.0
    exact = 1.0 / (safe * safe) - (1.0 + jnp.cos(safe)) / _safe_denom(
        2.0 * safe * jnp.sin(safe)
    )
    return jnp.where(small, series, exact)


# --- theta^2-input variants -------------------------------------------------
#
# For vector tangents the angle enters as theta = ||w||, whose derivative at
# w = 0 is NaN.  All coefficient functions are even in theta, so these variants
# take theta^2 = w @ w (polynomial in w, smooth everywhere) and perform the
# sqrt only on a guarded value inside the exact branch.

_CUT2 = _CUT * _CUT


def _cut2(dtype):
    c = _cut(dtype)
    return c * c


def _guard2(x2):
    small = x2 < _cut2(x2.dtype)
    safe = jnp.sqrt(jnp.where(small, jnp.ones_like(x2), x2))
    return small, safe


def sinc2(x2):
    """sin(t)/t with t = sqrt(x2)."""
    small, t = _guard2(x2)
    series = 1.0 - x2 / 6.0 * (1.0 - x2 / 20.0 * (1.0 - x2 / 42.0))
    return jnp.where(small, series, jnp.sin(t) / t)


def cos2(x2):
    """cos(t) with t = sqrt(x2)."""
    small, t = _guard2(x2)
    series = 1.0 - x2 / 2.0 * (1.0 - x2 / 12.0 * (1.0 - x2 / 30.0))
    return jnp.where(small, series, jnp.cos(t))


def cos1c2(x2):
    """(1 - cos(t)) / t^2 with t = sqrt(x2)."""
    small, t = _guard2(x2)
    series = 0.5 * (1.0 - x2 / 12.0 * (1.0 - x2 / 30.0 * (1.0 - x2 / 56.0)))
    return jnp.where(small, series, (1.0 - jnp.cos(t)) / (t * t))


def sin3c2(x2):
    """(t - sin(t)) / t^3 with t = sqrt(x2)."""
    small, t = _guard2(x2)
    series = (1.0 - x2 / 20.0 * (1.0 - x2 / 42.0 * (1.0 - x2 / 72.0))) / 6.0
    return jnp.where(small, series, (t - jnp.sin(t)) / (t * t * t))


def jlinv2c2(x2):
    """1/t^2 - (1 + cos(t)) / (2 t sin(t)) with t = sqrt(x2)."""
    small, t = _guard2(x2)
    series = (1.0 + x2 / 60.0 * (1.0 + x2 / 42.0 * (1.0 + x2 / 40.0))) / 12.0
    exact = 1.0 / (t * t) - (1.0 + jnp.cos(t)) / _safe_denom(2.0 * t * jnp.sin(t))
    return jnp.where(small, series, exact)


def acos_over_sinc(x):
    """Helper a(x) = x / tan(x) used in planar logs: (A/(2B)) for SE(2).

    Returns sin(x)*x/(2*(1-cos(x))) = (x/2) cot(x/2), series 1 - x^2/12 - ...
    """
    small, safe = _guard(x)
    x2 = x * x
    series = 1.0 - x2 / 12.0 * (1.0 + x2 / 60.0 * (1.0 + x2 / 42.0))
    exact = 0.5 * safe * jnp.sin(safe) / _safe_denom(1.0 - jnp.cos(safe))
    return jnp.where(small, series, exact)


# --- higher-order coefficients for SE(3) Q-blocks and closed d2r forms ------
#
# The Q-block of the SE(3) Jacobian [Barfoot, "State Estimation for Robotics",
# eq. 7.86] uses (t - sin t)/t^3 (sin3c2 above) plus the two functions below.
# Both suffer catastrophic cancellation in their exact branch for small t, so
# the series cutoff is much larger (t = 0.5): five series terms hold ~1e-10
# relative accuracy there while the exact branch is clean above it.


def cos4c2(x2):
    """(1 - t^2/2 - cos(t)) / t^4 with t = sqrt(x2)  (= -1/24 + t^2/720 - ...).

    NOTE (here and in every exact branch below): the denominator must use the
    GUARDED square ``t*t``, never the raw ``x2`` — dividing by raw x2 makes
    the unselected branch inf at x2 = 0 and reverse-mode ``where`` turns the
    0 * inf into NaN (measured: jacrev of the flattened SE(3) dynamics was
    NaN at e = 0 while jacfwd was finite)."""
    small = x2 < 0.25
    t = jnp.sqrt(jnp.where(small, jnp.ones_like(x2), x2))
    x2s = t * t  # guarded square: == x2 on the exact branch, 1 on the series
    series = (
        -(1.0 - x2 / 30.0 * (1.0 - x2 / 56.0 * (1.0 - x2 / 90.0 * (1.0 - x2 / 132.0))))
        / 24.0
    )
    exact = (1.0 - 0.5 * x2s - jnp.cos(t)) / (x2s * x2s)
    return jnp.where(small, series, exact)


def sin5c2(x2):
    """(t - sin(t) - t^3/6) / t^5 with t = sqrt(x2)  (= -1/120 + t^2/5040 - ...)."""
    small = x2 < 0.25
    t = jnp.sqrt(jnp.where(small, jnp.ones_like(x2), x2))
    x2s = t * t
    series = (
        -(1.0 - x2 / 42.0 * (1.0 - x2 / 72.0 * (1.0 - x2 / 110.0 * (1.0 - x2 / 156.0))))
        / 120.0
    )
    exact = (t - jnp.sin(t) - t * x2s / 6.0) / (x2s * x2s * t)
    return jnp.where(small, series, exact)


# --- derivatives w.r.t. s = t^2 of the Jacobian coefficients ----------------
#
# Used by the closed-form second-order derivatives d2r_exp / d2r_expinv:
# with c(s) and s = v.v, grad_v c = c'(s) * 2 v.  Cutoff t = 0.1 balances the
# mild cancellation of the exact branches against 4-term series truncation.

_DCUT2 = 1e-2  # f64 seam; f32 uses 0.25 (same rationale as _cut)


def _dcut2(dtype):
    return 0.25 if jnp.finfo(dtype).bits <= 32 else _DCUT2


def dcos1c2(x2):
    """d/ds [(1 - cos t)/t^2], s = t^2 = x2."""
    small = x2 < _dcut2(x2.dtype)
    t = jnp.sqrt(jnp.where(small, jnp.ones_like(x2), x2))
    x2s = t * t  # guarded square (see cos4c2's NaN note)
    series = -(1.0 - x2 / 15.0 * (1.0 - 3.0 * x2 / 112.0 * (1.0 - 2.0 * x2 / 135.0))) / 24.0
    exact = jnp.sin(t) / (2.0 * t * x2s) - (1.0 - jnp.cos(t)) / (x2s * x2s)
    return jnp.where(small, series, exact)


def dsin3c2(x2):
    """d/ds [(t - sin t)/t^3], s = t^2 = x2."""
    small = x2 < _dcut2(x2.dtype)
    t = jnp.sqrt(jnp.where(small, jnp.ones_like(x2), x2))
    x2s = t * t
    series = -(1.0 - x2 / 21.0 * (1.0 - x2 / 48.0 * (1.0 - 2.0 * x2 / 165.0))) / 120.0
    exact = (1.0 - jnp.cos(t)) / (2.0 * x2s * x2s) - 3.0 * (t - jnp.sin(t)) / (
        2.0 * x2s * x2s * t
    )
    return jnp.where(small, series, exact)


def djlinv2c2(x2):
    """d/ds [1/t^2 - (1 + cos t)/(2 t sin t)], s = t^2 = x2."""
    small = x2 < _dcut2(x2.dtype)
    t = jnp.sqrt(jnp.where(small, jnp.ones_like(x2), x2))
    x2s = t * t
    series = (1.0 + x2 / 21.0 * (1.0 + 3.0 * x2 / 80.0)) / 720.0
    s_, c_ = jnp.sin(t), jnp.cos(t)
    N = 1.0 + c_
    # d/dt [N/(2 t s)] = (-s * 2ts - N*(2s + 2tc)) / (2ts)^2
    du = (-s_ * 2.0 * t * s_ - N * (2.0 * s_ + 2.0 * t * c_)) / _safe_denom(
        4.0 * x2s * s_ * s_
    )
    dc3_dt = -2.0 / (x2s * t) - du
    return jnp.where(small, series, dc3_dt / (2.0 * t))


def dcos4c2(x2):
    """d/ds [(1 - s/2 - cos t)/s^2], s = t^2 = x2.

    Series: d/ds [-1/24 + s/720 - s^2/40320 + s^3/3628800 - ...]
          = (1 - s/28 (1 - s/60 (1 - s/99))) / 720.
    Cutoff matches cos4c2's (t = 0.5): the exact branch loses one more power
    to cancellation than its parent."""
    small = x2 < 0.25
    t = jnp.sqrt(jnp.where(small, jnp.ones_like(x2), x2))
    x2s = t * t
    series = (1.0 - x2 / 28.0 * (1.0 - x2 / 60.0 * (1.0 - x2 / 99.0))) / 720.0
    exact = (-0.5 + jnp.sin(t) / (2.0 * t)) / (x2s * x2s) - 2.0 * (
        1.0 - 0.5 * x2s - jnp.cos(t)
    ) / (x2s * x2s * x2s)
    return jnp.where(small, series, exact)


def dsin5c2(x2):
    """d/ds [(t - sin t - t^3/6)/(s^2 t)], s = t^2 = x2.

    Series: d/ds [-1/120 + s/5040 - s^2/362880 + s^3/39916800 - ...]
          = (1 - s/36 (1 - 3 s/220 (1 - s/117))) / 5040."""
    small = x2 < 0.25
    t = jnp.sqrt(jnp.where(small, jnp.ones_like(x2), x2))
    x2s = t * t
    series = (1.0 - x2 / 36.0 * (1.0 - 3.0 * x2 / 220.0 * (1.0 - x2 / 117.0))) / 5040.0
    exact = (1.0 - jnp.cos(t) - 0.5 * x2s) / (2.0 * x2s * x2s * x2s) - 2.5 * (
        t - jnp.sin(t) - t * x2s / 6.0
    ) / (x2s * x2s * x2s * t)
    return jnp.where(small, series, exact)
