"""Compensated (two-float) accumulation primitives for f32 TPU numerics.

TPU has no hardware f64 (XLA's f64 emulation faults on large programs —
see benchmarks/ocp_se2.py), so residuals that must certify below the f32
accumulation floor are computed with error-free transforms instead: every
add/multiply also yields its exact rounding error (Knuth two-sum, Dekker
two-product), and the errors ride along as a correction term.  The result
``hi + lo`` carries ~eps^2 accumulation error — f64-like accuracy from pure
f32 ops — at a few-x elementwise cost, with no emulation and no unsupported
kernels.  This fills the role of the reference's f64 NLP path
(compat/ipopt.hpp:298 + MUMPS) for the on-device KKT certificate.

All transforms rely only on IEEE round-to-nearest per-op semantics, which
XLA preserves (it does not reassociate floats or contract a*b+c into fma
behind your back); tests/test_compensated.py pins the claim against f64.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def two_sum(a, b):
    """Knuth's branch-free error-free addition: a + b = s + e exactly."""
    s = a + b
    bp = s - a
    e = (a - (s - bp)) + (b - bp)
    return s, e


def _split(a):
    """Veltkamp split of a into hi + lo with non-overlapping halves.

    The constant is 2**ceil(p/2) + 1 for a p-bit mantissa (p=24 for f32,
    p=53 for f64); picked from the dtype so the transforms stay exact when
    tests run them in f64.
    """
    p = jnp.finfo(a.dtype).nmant + 1
    c = jnp.asarray(2.0 ** ((p + 1) // 2) + 1.0, a.dtype) * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Dekker's error-free product: a * b = p + e exactly (no fma needed)."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def csum(x, axis=0):
    """Compensated sum along ``axis``: returns (hi, lo) with
    hi + lo = sum(x) to ~eps^2 relative accumulation error.

    Pairwise (tree) reduction of two_sum steps — log2(n) vectorized levels,
    TPU-friendly (no serial scan).  The per-level rounding errors are tiny
    (O(eps) of their operands) so they accumulate with plain adds.
    """
    x = jnp.moveaxis(x, axis, 0)
    lo = jnp.zeros_like(x, shape=x.shape[1:])
    while x.shape[0] > 1:
        n = x.shape[0]
        if n % 2:
            x = jnp.concatenate([x, jnp.zeros_like(x, shape=(1,) + x.shape[1:])])
            n += 1
        s, e = two_sum(x[0::2], x[1::2])
        lo = lo + e.sum(axis=0)
        x = s
    return x[0], lo


def cdot(a, b, axis=0):
    """Compensated dot product along ``axis`` (Ogita-Rump-Oishi dot2):
    returns (hi, lo) with hi + lo = sum(a * b) to ~eps^2 accuracy."""
    p, e = two_prod(a, b)
    s, c = csum(p, axis=axis)
    return s, c + e.sum(axis=axis)


def cadd(hi1, lo1, hi2, lo2):
    """Add two (hi, lo) pairs, renormalized."""
    s, e = two_sum(hi1, hi2)
    lo = e + lo1 + lo2
    s2, e2 = two_sum(s, lo)
    return s2, e2


def cmatvec(M, v):
    """Compensated batched matvec ``M @ v``: M (..., r, k), v (..., k) ->
    (hi, lo) of shape (..., r)."""
    return cdot(M, v[..., None, :], axis=-1)


def cmatvec_t(J, lam):
    """Compensated J^T lam.

    J: (m, n) or (B, m, n); lam: (m,) or (B, m).  Returns (hi, lo) of shape
    (n,) / (B, n).  The contraction axis rides the compensated pairwise sum;
    everything else is vectorized VPU elementwise work.
    """
    if J.ndim == 2:
        return cdot(J, lam[:, None], axis=0)
    return cdot(J, lam[:, :, None], axis=1)


def stationarity_compensated(grad, J, lam, z):
    """inf-norm of grad + J^T lam + z with compensated accumulation.

    grad/z: (n,) or (B, n); J: (m, n) or (B, m, n); lam: (m,) or (B, m).
    The f32 floor of the plain einsum is ~eps * m * |J||lam| (measured
    ~1e-3..1e-2 on collocation NLPs with m ~ 100, |lam| ~ 10); compensated
    it drops to ~eps * |residual| + eps^2 * m * |J||lam| — certifiable at
    1e-4 and below on-device.
    """
    hi, lo = cmatvec_t(J, lam)
    hi, lo = cadd(hi, lo, grad, jnp.zeros_like(grad))
    hi, lo = cadd(hi, lo, z, jnp.zeros_like(z))
    return jnp.max(jnp.abs(hi + lo), axis=-1)
