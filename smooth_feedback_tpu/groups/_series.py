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

_CUT = 1e-2  # |x| cutoff between series and exact branch


def _guard(x):
    small = jnp.abs(x) < _CUT
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


def _guard2(x2):
    small = x2 < _CUT2
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
