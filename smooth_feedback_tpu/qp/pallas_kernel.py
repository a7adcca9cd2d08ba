"""Fused Pallas TPU kernel for the ADMM iteration loop.

The XLA path streams Minv/As/Ps from HBM on every ADMM iteration (3 batched
matvecs -> memory bound at ~n^2 * B * 12 bytes/iteration).  This kernel
pins one problem's matrices in VMEM per grid step and runs the ENTIRE
iteration loop from on-chip memory — per-iteration HBM traffic drops to zero,
leaving only the one-time load.

Scope: the iteration + stopping-check phase.  Scaling/factorization (see
``qp_factorize``) and optional polish stay in XLA.  Stopping checks reproduce
the solver's unscaled-residual semantics using only scaled data:

    A x_us  = (1/sy) . (As x)          P x_us + q + A'y_us = (1/(c sx)) .
    z_us    = (1/sy) . z                      (Ps x + qs + As' y)

Problems are zero-padded to lane multiples; padded rows use l = u = 0 and
rho = 1, which keeps the padded coordinates exactly zero through the
iteration and transparent to every norm and certificate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .types import QPSolution, QPSolutionStatus, QPSolverParams, QuadraticProgram

_RUNNING = int(QPSolutionStatus.Running)
_OPTIMAL = int(QPSolutionStatus.Optimal)
_PRIMAL_INF = int(QPSolutionStatus.PrimalInfeasible)
_DUAL_INF = int(QPSolutionStatus.DualInfeasible)
_MAX_ITER = int(QPSolutionStatus.MaxIterations)
_UNKNOWN = int(QPSolutionStatus.Unknown)


def _round_up(x, m):
    return -(-x // m) * m


def _admm_kernel(
    prm,
    n,
    m,
    # refs
    Minv_ref,
    As_ref,
    Ps_ref,
    qs_ref,
    ls_ref,
    us_ref,
    rho_ref,
    sx_ref,
    sy_ref,
    c_ref,
    l_ref,
    u_ref,
    x0_ref,
    z0_ref,
    y0_ref,
    status0_ref,
    x_out,
    z_out,
    y_out,
    stat_out,
    iter_out,
    pres_out,
    dres_out,
):
    f32 = jnp.float32
    Minv = Minv_ref[0]
    As = As_ref[0]
    Ps = Ps_ref[0]
    qs = qs_ref[0]  # (1, n)
    ls = ls_ref[0]
    us = us_ref[0]
    rho = rho_ref[0]
    sx = sx_ref[0]
    sy = sy_ref[0]
    c = c_ref[0, 0, 0]
    lv = l_ref[0]
    uv = u_ref[0]

    inf = jnp.asarray(jnp.inf, f32)
    alpha = jnp.asarray(prm.alpha, f32)
    sigma = jnp.asarray(prm.sigma, f32)
    eps_abs = jnp.asarray(prm.eps_abs, f32)
    eps_rel = jnp.asarray(prm.eps_rel, f32)
    eps_pinf = jnp.asarray(prm.eps_primal_inf, f32)
    eps_dinf = jnp.asarray(prm.eps_dual_inf, f32)

    # f32 masks: Mosaic cannot lower nested selects on i1 vectors
    mu_inf = (uv >= inf).astype(f32)
    ml_inf = (lv <= -inf).astype(f32)
    mu_fin = 1.0 - mu_inf
    ml_fin = 1.0 - ml_inf
    # finite-value copies (0 * inf would poison the masked sums with NaN)
    uv_fin = jnp.where(uv >= inf, 0.0, uv)
    lv_fin = jnp.where(lv <= -inf, 0.0, lv)

    def mv(M, v):  # (1, k) @ (k, j) -> (1, j)
        return jnp.dot(v, M, preferred_element_type=f32)

    def norm_inf(v):
        return jnp.max(jnp.abs(v))

    def check(x, z, y, x_old, y_old):
        # unscaled residual reconstruction (see module docstring)
        inv_sy = 1.0 / sy
        inv_csx = 1.0 / (c * sx)

        Ax = mv(As.T, x) * inv_sy  # = A x_us
        z_us = z * inv_sy
        pres = norm_inf(Ax - z_us)
        prim_ok = pres <= eps_abs + eps_rel * jnp.maximum(norm_inf(Ax), norm_inf(z_us))

        Px = mv(Ps.T, x) * inv_csx
        Aty = mv(As, y) * inv_csx
        qv = qs * inv_csx
        dres = norm_inf(Px + qv + Aty)
        dscale = jnp.maximum(norm_inf(Px), jnp.maximum(norm_inf(qv), norm_inf(Aty)))
        dual_ok = dres <= eps_abs + eps_rel * dscale
        optimal = jnp.logical_and(prim_ok, dual_ok)

        # primal infeasibility certificate
        dy_us = sy * (y - y_old) / c
        E = norm_inf(dy_us)
        Atdy = mv(As, y - y_old) * inv_csx  # = A' dy_us
        viol_f = jnp.max(
            mu_inf * (dy_us > eps_pinf * E).astype(f32)
            + ml_inf * (dy_us < -eps_pinf * E).astype(f32)
        )
        sum_term = jnp.sum(
            uv_fin * jnp.maximum(0.0, dy_us) + lv_fin * jnp.minimum(0.0, dy_us)
        )
        prim_inf = jnp.logical_and(
            viol_f < 0.5,
            jnp.maximum(norm_inf(Atdy), sum_term) < eps_pinf * E,
        )

        # dual infeasibility certificate
        dx_us = sx * (x - x_old)
        dxn = norm_inf(dx_us)
        Pdx = mv(Ps.T, x - x_old) * inv_csx
        Adx = mv(As.T, x - x_old) * (1.0 / sy)
        tol = eps_dinf * dxn
        row_f = (
            mu_inf * (Adx >= -tol).astype(f32)
            + ml_inf * mu_fin * (Adx <= tol).astype(f32)
            + ml_fin * mu_fin * (jnp.abs(Adx) < tol).astype(f32)
        )
        row_ok = jnp.min(row_f) > 0.5
        qdx = jnp.sum(qs * inv_csx * dx_us)
        dual_inf = jnp.logical_and(
            jnp.logical_and(norm_inf(Pdx) <= tol, qdx <= tol), row_ok
        )

        # divergence detection (semantics match the XLA path).  f32-mask
        # formulation: mosaic's bool-reduction lowering consults the global
        # x64 flag and emits f64 scalars under jax_enable_x64 (NaN < inf is
        # False, so |v| < inf is exactly isfinite for floats)
        x_fin = jnp.min((jnp.abs(x) < inf).astype(f32))
        y_fin = jnp.min((jnp.abs(y) < inf).astype(f32))
        diverged = jnp.minimum(x_fin, y_fin) < 0.5
        st = jnp.where(
            diverged,
            _UNKNOWN,
            jnp.where(
                optimal,
                _OPTIMAL,
                jnp.where(
                    prim_inf, _PRIMAL_INF, jnp.where(dual_inf, _DUAL_INF, _RUNNING)
                ),
            ),
        ).astype(jnp.int32)
        return st, pres, dres

    def cond(carry):
        it, x, z, y, status, pres, dres = carry
        return jnp.logical_and(it < prm.max_iter, status == _RUNNING)

    def body(carry):
        it, x, z, y, status, pres, dres = carry
        x_old = x
        y_old = y

        rhs = sigma * x - qs + mv(As, rho * z - y)
        xt = mv(Minv, rhs)  # Minv symmetric
        zt = mv(As.T, xt)

        xn = alpha * xt + (1 - alpha) * x
        zn = jnp.clip(alpha * zt + (1 - alpha) * z + y / rho, ls, us)
        yn = y + rho * (alpha * zt + (1 - alpha) * z - zn)

        # explicit int32: under jax_enable_x64 the python-int modulus would
        # promote to int64 mid-kernel-trace, which mosaic cannot lower (and
        # the attempted conversion recurses to a RecursionError)
        do_check = lax.rem(it, jnp.int32(prm.stop_check_iter)) == jnp.int32(
            1 % prm.stop_check_iter
        )
        status, pres, dres = lax.cond(
            do_check,
            lambda: check(xn, zn, yn, x_old, y_old),
            lambda: (status, pres, dres),
        )
        return it + 1, xn, zn, yn, status, pres, dres

    init = (
        jnp.int32(0),
        x0_ref[0],
        z0_ref[0],
        y0_ref[0],
        status0_ref[0, 0, 0],
        inf,
        inf,
    )
    it, x, z, y, status, pres, dres = lax.while_loop(cond, body, init)

    x_out[0] = x
    z_out[0] = z
    y_out[0] = y
    stat_out[0, 0, 0] = jnp.where(status == _RUNNING, _MAX_ITER, status)
    iter_out[0, 0, 0] = it
    pres_out[0, 0, 0] = pres
    dres_out[0, 0, 0] = dres


def _admm_kernel_shared(
    prm,
    G,
    # refs (matrices shared by every problem in the batch)
    Minv_ref,  # (n, n)
    As_ref,  # (m, n)
    Ps_ref,  # (n, n)
    rho_ref,  # (1, m)
    sx_ref,  # (1, n)
    sy_ref,  # (1, m)
    c_ref,  # (1, 1) SMEM
    qs_ref,  # (G, n)
    ls_ref,  # (G, m)
    us_ref,  # (G, m)
    l_ref,  # (G, m)
    u_ref,  # (G, m)
    x0_ref,  # (G, n)
    z0_ref,  # (G, m)
    y0_ref,  # (G, m)
    status0_ref,  # (G, 1) int32
    x_out,
    z_out,
    y_out,
    stat_out,
    iter_out,
    pres_out,
    dres_out,
):
    """Shared-matrix variant: G problems iterate together, so every matvec is
    a (G, k) @ (k, j) GEMM on the MXU.  Semantics match the per-problem kernel
    (same updates, same stopping checks); the one difference is iteration
    accounting — the block runs until every member finishes, with per-problem
    freeze masking exactly like the XLA path."""
    f32 = jnp.float32
    Minv = Minv_ref[...]
    As = As_ref[...]
    Ps = Ps_ref[...]
    qs = qs_ref[...]
    ls = ls_ref[...]
    us = us_ref[...]
    rho = rho_ref[...]  # (1, m), broadcasts over G
    sx = sx_ref[...]
    sy = sy_ref[...]
    c = c_ref[0, 0]
    lv = l_ref[...]
    uv = u_ref[...]

    inf = jnp.asarray(jnp.inf, f32)
    alpha = jnp.asarray(prm.alpha, f32)
    sigma = jnp.asarray(prm.sigma, f32)
    eps_abs = jnp.asarray(prm.eps_abs, f32)
    eps_rel = jnp.asarray(prm.eps_rel, f32)
    eps_pinf = jnp.asarray(prm.eps_primal_inf, f32)
    eps_dinf = jnp.asarray(prm.eps_dual_inf, f32)

    mu_inf = (uv >= inf).astype(f32)
    ml_inf = (lv <= -inf).astype(f32)
    mu_fin = 1.0 - mu_inf
    ml_fin = 1.0 - ml_inf
    uv_fin = jnp.where(uv >= inf, 0.0, uv)
    lv_fin = jnp.where(lv <= -inf, 0.0, lv)

    # NOTE a bf16-input/f32-accumulate variant of the update GEMMs was
    # measured and REJECTED: the ADMM fixed point wanders at bf16 input-
    # rounding scale (~1e-3 relative), so no element ever certifies the
    # eps=1e-3 stopping criterion (0/2048 Optimal vs 2048/2048 in f32), and
    # warmstarted closed loops iterate mostly below that noise floor anyway.
    # (Mosaic detail for future attempts: bf16 operands need an explicit
    # precision=DEFAULT — the solver-wide "highest" scope otherwise makes
    # Mosaic reject the matmul with "Bad lhs type".)
    def mm(V, M):  # (G, k) @ (k, j)
        return jnp.dot(V, M, preferred_element_type=f32)

    def rownorm(V):  # (G, k) -> (G, 1)
        return jnp.max(jnp.abs(V), axis=1, keepdims=True)

    def check(x, z, y, x_old, y_old):
        inv_sy = 1.0 / sy
        inv_csx = 1.0 / (c * sx)

        Ax = mm(x, As.T) * inv_sy
        z_us = z * inv_sy
        pres = rownorm(Ax - z_us)
        prim_ok = pres <= eps_abs + eps_rel * jnp.maximum(rownorm(Ax), rownorm(z_us))

        Px = mm(x, Ps.T) * inv_csx
        Aty = mm(y, As) * inv_csx
        qv = qs * inv_csx
        dres = rownorm(Px + qv + Aty)
        dscale = jnp.maximum(rownorm(Px), jnp.maximum(rownorm(qv), rownorm(Aty)))
        dual_ok = dres <= eps_abs + eps_rel * dscale
        optimal = jnp.logical_and(prim_ok, dual_ok)

        dy_us = sy * (y - y_old) / c
        E = rownorm(dy_us)
        Atdy = mm(y - y_old, As) * inv_csx
        viol_f = jnp.max(
            mu_inf * (dy_us > eps_pinf * E).astype(f32)
            + ml_inf * (dy_us < -eps_pinf * E).astype(f32),
            axis=1,
            keepdims=True,
        )
        sum_term = jnp.sum(
            uv_fin * jnp.maximum(0.0, dy_us) + lv_fin * jnp.minimum(0.0, dy_us),
            axis=1,
            keepdims=True,
        )
        prim_inf = jnp.logical_and(
            viol_f < 0.5,
            jnp.maximum(rownorm(Atdy), sum_term) < eps_pinf * E,
        )

        dx_us = sx * (x - x_old)
        dxn = rownorm(dx_us)
        Pdx = mm(x - x_old, Ps.T) * inv_csx
        Adx = mm(x - x_old, As.T) * (1.0 / sy)
        tol = eps_dinf * dxn
        row_f = (
            mu_inf * (Adx >= -tol).astype(f32)
            + ml_inf * mu_fin * (Adx <= tol).astype(f32)
            + ml_fin * mu_fin * (jnp.abs(Adx) < tol).astype(f32)
        )
        row_ok = jnp.min(row_f, axis=1, keepdims=True) > 0.5
        qdx = jnp.sum(qs * inv_csx * dx_us, axis=1, keepdims=True)
        dual_inf = jnp.logical_and(
            jnp.logical_and(rownorm(Pdx) <= tol, qdx <= tol), row_ok
        )

        # f32-mask formulation of all(isfinite(.)) per row — see the
        # per-problem kernel's divergence note (mosaic bool reductions
        # go f64 under jax_enable_x64)
        x_fin = jnp.min((jnp.abs(x) < inf).astype(f32), axis=1, keepdims=True)
        y_fin = jnp.min((jnp.abs(y) < inf).astype(f32), axis=1, keepdims=True)
        diverged = jnp.minimum(x_fin, y_fin) < 0.5
        st = jnp.where(
            diverged,
            _UNKNOWN,
            jnp.where(
                optimal,
                _OPTIMAL,
                jnp.where(
                    prim_inf, _PRIMAL_INF, jnp.where(dual_inf, _DUAL_INF, _RUNNING)
                ),
            ),
        ).astype(jnp.int32)
        return st, pres, dres

    def cond(carry):
        it, x, z, y, status, iters, pres, dres = carry
        return jnp.logical_and(it < prm.max_iter, jnp.any(status == _RUNNING))

    def body(carry):
        it, x, z, y, status, iters, pres, dres = carry
        x_old = x
        y_old = y

        rhs = sigma * x - qs + mm(rho * z - y, As)
        xt = mm(rhs, Minv)
        zt = mm(xt, As.T)

        xn = alpha * xt + (1 - alpha) * x
        zn = jnp.clip(alpha * zt + (1 - alpha) * z + y / rho, ls, us)
        yn = y + rho * (alpha * zt + (1 - alpha) * z - zn)

        # explicit int32: under jax_enable_x64 the python-int modulus would
        # promote to int64 mid-kernel-trace, which mosaic cannot lower (and
        # the attempted conversion recurses to a RecursionError)
        do_check = lax.rem(it, jnp.int32(prm.stop_check_iter)) == jnp.int32(
            1 % prm.stop_check_iter
        )
        new_status, pres_n, dres_n = lax.cond(
            do_check,
            lambda: check(xn, zn, yn, x_old, y_old),
            lambda: (jnp.full((G, 1), _RUNNING, jnp.int32), pres, dres),
        )

        run = status == _RUNNING  # (G, 1)
        x = jnp.where(run, xn, x)
        z = jnp.where(run, zn, z)
        y = jnp.where(run, yn, y)
        status = jnp.where(run, new_status, status)
        iters = jnp.where(run, it + 1, iters)
        pres = jnp.where(run, pres_n, pres)
        dres = jnp.where(run, dres_n, dres)
        return it + 1, x, z, y, status, iters, pres, dres

    init = (
        jnp.int32(0),
        x0_ref[...],
        z0_ref[...],
        y0_ref[...],
        status0_ref[...],
        jnp.zeros((G, 1), jnp.int32),
        jnp.full((G, 1), inf),
        jnp.full((G, 1), inf),
    )
    it, x, z, y, status, iters, pres, dres = lax.while_loop(cond, body, init)

    x_out[...] = x
    z_out[...] = z
    y_out[...] = y
    stat_out[...] = jnp.where(status == _RUNNING, _MAX_ITER, status)
    iter_out[...] = iters
    pres_out[...] = pres
    dres_out[...] = dres


# Physical VMEM on v5e is 128MB; Mosaic's *default* scoped limit is 16MB but
# can be raised per-kernel via CompilerParams(vmem_limit_bytes=...) (verified
# on-device: a 32MB working set compiles and runs at vmem_limit_bytes=100MB).
# Budget the fused kernel conservatively below the physical limit so the
# compiler keeps pipelining headroom; the G-fit heuristic underestimates the
# true Mosaic footprint by up to ~2x (measured 16.5M actual vs 9.9M estimated
# at padded 384, G=128), hence the safety factor in _g_fit.
_VMEM_PHYS = 128 * 2**20
_VMEM_RAISED = 100 * 2**20  # per-kernel scoped limit when raising
_VMEM_DEFAULT = 16 * 2**20  # Mosaic default scoped limit
_FOOTPRINT_FUDGE = 2.0  # estimate -> actual safety factor


def _shared_static_bytes(n_pad: int, m_pad: int) -> int:
    # shared matrices (Minv, Ps, As) + ~1MB slack for Mosaic's own buffers
    return 4 * (2 * n_pad * n_pad + m_pad * n_pad) + (1 << 20)


def _shared_per_problem_bytes(n_pad: int, m_pad: int) -> int:
    # ~18 live f32 (G, n|m) work arrays: carries, olds, bounds, masks
    return 18 * 4 * (n_pad + m_pad)


def _g_fit(n_pad: int, m_pad: int, budget: int) -> int:
    """Largest row-block G (multiple of 128, floor 64) whose estimated
    footprint stays under ``budget`` after the measured fudge factor."""
    avail = budget / _FOOTPRINT_FUDGE - _shared_static_bytes(n_pad, m_pad)
    g = int(avail // _shared_per_problem_bytes(n_pad, m_pad))
    return max(64, g // 128 * 128)


def shared_kernel_fits(n: int, m: int) -> bool:
    """Whether the fused shared-matrix kernel fits on-chip for this problem
    size.  Padded sizes <= 256 fit the default 16MB scoped-VMEM limit; larger
    problems (e.g. the padded-384 K=100 MPC horizon) fit by raising the
    per-kernel limit toward the 128MB physical VMEM — the fused path now
    covers every horizon whose shared matrices + one G=64 problem block fit
    the raised budget (~padded 1024).  Callers fall back to the XLA
    shared-GEMM path above that."""
    n_pad = _round_up(max(n, 128), 128)
    m_pad = _round_up(max(m, 128), 128)
    est = _shared_static_bytes(n_pad, m_pad) + 64 * _shared_per_problem_bytes(
        n_pad, m_pad
    )
    return est * _FOOTPRINT_FUDGE <= _VMEM_RAISED


def admm_iterate_pallas_shared(
    prm: QPSolverParams,
    Minv,  # (n, n) shared
    As,  # (m, n) shared
    Ps,  # (n, n) shared
    qs,  # (B, n)
    ls,
    us,
    rho,  # (m,) shared
    sx,  # (n,) shared
    sy,  # (m,) shared
    c,  # scalar shared
    l,
    u,
    x0,
    z0,
    y0,
    status0,
    interpret: bool = False,
    block: int = 128,
):
    """Shared-matrix fused ADMM: every problem in the batch has the same
    scaled matrices (the reuse-factors MPC fleet case); iterations are real
    (G, n) x (n, m) GEMMs on the MXU."""
    B, n = qs.shape
    m = ls.shape[1]
    n_pad = _round_up(max(n, 128), 128)
    m_pad = _round_up(max(m, 128), 128)
    # VMEM-fit the problem block.  Problems fitting Mosaic's default 16MB
    # scoped limit (padded <= 256, e.g. K=50 MPC) keep the measured-optimal
    # default path; larger problems (padded 384 = K=100 MPC and up) raise the
    # per-kernel scoped limit toward physical VMEM and size G against the
    # raised budget — this is what removes the 15x K=100 fused-vs-XLA cliff.
    if n_pad <= 256 and m_pad <= 256:
        # same 15MB-budget formula as before the raised-limit path existed
        # (measured-optimal for the K=50 flagship config: G=256 fits, 512
        # exceeded the default scoped limit)
        g_fit = _g_fit(n_pad, m_pad, int(15 * 2**20 * _FOOTPRINT_FUDGE))
        vmem_limit = None  # Mosaic default
    else:
        g_fit = _g_fit(n_pad, m_pad, _VMEM_RAISED)
        vmem_limit = _VMEM_RAISED
    G = min(block, B, g_fit)
    B_pad = _round_up(B, G)

    f32 = jnp.float32

    def padm(a, r, ccols):
        return jnp.pad(a.astype(f32), ((0, r - a.shape[0]), (0, ccols - a.shape[1])))

    def padv1(a, r, value=0.0):
        return jnp.pad(a.astype(f32), ((0, r - a.shape[0]),), constant_values=value)[None, :]

    def padb(a, ccols, value=0.0):
        return jnp.pad(
            a.astype(f32),
            ((0, B_pad - a.shape[0]), (0, ccols - a.shape[1])),
            constant_values=value,
        )

    args = (
        padm(Minv, n_pad, n_pad),
        padm(As, m_pad, n_pad),
        padm(Ps, n_pad, n_pad),
        padv1(rho, m_pad, value=1.0),
        padv1(sx, n_pad, value=1.0),
        padv1(sy, m_pad, value=1.0),
        jnp.asarray(c, f32)[None, None],
        padb(qs, n_pad),
        padb(ls, m_pad),
        padb(us, m_pad),
        padb(l, m_pad),
        padb(u, m_pad),
        padb(x0, n_pad),
        padb(z0, m_pad),
        padb(y0, m_pad),
        jnp.pad(
            status0.astype(jnp.int32)[:, None],
            ((0, B_pad - B), (0, 0)),
            constant_values=_OPTIMAL,  # padded rows: already done
        ),
    )

    shared2 = lambda r, cc: pl.BlockSpec((r, cc), lambda b: (0, 0), memory_space=pltpu.VMEM)
    perblk = lambda cc: pl.BlockSpec((G, cc), lambda b: (b, 0), memory_space=pltpu.VMEM)

    in_specs = [
        shared2(n_pad, n_pad),  # Minv
        shared2(m_pad, n_pad),  # As
        shared2(n_pad, n_pad),  # Ps
        shared2(1, m_pad),  # rho
        shared2(1, n_pad),  # sx
        shared2(1, m_pad),  # sy
        pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),  # c
        perblk(n_pad),  # qs
        perblk(m_pad),  # ls
        perblk(m_pad),  # us
        perblk(m_pad),  # l
        perblk(m_pad),  # u
        perblk(n_pad),  # x0
        perblk(m_pad),  # z0
        perblk(m_pad),  # y0
        pl.BlockSpec((G, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),  # status0
    ]
    out_shape = (
        jax.ShapeDtypeStruct((B_pad, n_pad), f32),
        jax.ShapeDtypeStruct((B_pad, m_pad), f32),
        jax.ShapeDtypeStruct((B_pad, m_pad), f32),
        jax.ShapeDtypeStruct((B_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((B_pad, 1), jnp.int32),
        jax.ShapeDtypeStruct((B_pad, 1), f32),
        jax.ShapeDtypeStruct((B_pad, 1), f32),
    )
    out_specs = (
        perblk(n_pad),
        perblk(m_pad),
        perblk(m_pad),
        pl.BlockSpec((G, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_admm_kernel_shared, prm, G)
    kwargs = {}
    if vmem_limit is not None and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(vmem_limit_bytes=vmem_limit)
    # trace the (f32-only) kernel under x32 semantics even when the caller
    # has jax_enable_x64 on: weak Python constants would otherwise become
    # f64/i64 mid-kernel, which mosaic cannot lower
    with jax.enable_x64(False):
        x, z, y, status, iters, pres, dres = pl.pallas_call(
            kernel,
            grid=(B_pad // G,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            **kwargs,
        )(*args)

    return (
        x[:B, :n],
        z[:B, :m],
        y[:B, :m],
        status[:B, 0],
        iters[:B, 0],
        pres[:B, 0],
        dres[:B, 0],
    )


def admm_iterate_pallas(
    prm: QPSolverParams,
    Minv,
    As,
    Ps,
    qs,
    ls,
    us,
    rho,
    sx,
    sy,
    c,
    l,
    u,
    x0,
    z0,
    y0,
    status0,
    interpret: bool = False,
):
    """Run the fused ADMM loop for a batch of pre-scaled, pre-factorized QPs.

    All inputs are float32 with leading batch axis; returns
    ``(x, z, y, status, iters, pres, dres)`` in scaled variables.
    """
    B, n = qs.shape
    m = ls.shape[1]
    n_pad = _round_up(max(n, 128), 128)
    m_pad = _round_up(max(m, 128), 128)

    def padm(a, r, ccols):
        return jnp.pad(a, ((0, 0), (0, r - a.shape[1]), (0, ccols - a.shape[2])))

    def padv(a, r, value=0.0):
        return jnp.pad(a, ((0, 0), (0, r - a.shape[1])), constant_values=value)

    f32 = jnp.float32
    args = (
        padm(Minv.astype(f32), n_pad, n_pad),
        padm(As.astype(f32), m_pad, n_pad),
        padm(Ps.astype(f32), n_pad, n_pad),
        padv(qs.astype(f32), n_pad)[:, None, :],
        padv(ls.astype(f32), m_pad)[:, None, :],
        padv(us.astype(f32), m_pad)[:, None, :],
        padv(rho.astype(f32), m_pad, value=1.0)[:, None, :],
        padv(sx.astype(f32), n_pad, value=1.0)[:, None, :],
        padv(sy.astype(f32), m_pad, value=1.0)[:, None, :],
        c.astype(f32)[:, None, None] * jnp.ones((B, 1, 1), f32),
        padv(l.astype(f32), m_pad)[:, None, :],
        padv(u.astype(f32), m_pad)[:, None, :],
        padv(x0.astype(f32), n_pad)[:, None, :],
        padv(z0.astype(f32), m_pad)[:, None, :],
        padv(y0.astype(f32), m_pad)[:, None, :],
        status0.astype(jnp.int32)[:, None, None] * jnp.ones((B, 1, 1), jnp.int32),
    )

    in_specs = [
        pl.BlockSpec((1, n_pad, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # Minv
        pl.BlockSpec((1, m_pad, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # As
        pl.BlockSpec((1, n_pad, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # Ps
        pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # qs
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # ls
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # us
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # rho
        pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # sx
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # sy
        pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),  # c
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # l
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # u
        pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # x0
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # z0
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),  # y0
        pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),  # status0
    ]
    out_shape = (
        jax.ShapeDtypeStruct((B, 1, n_pad), f32),  # x
        jax.ShapeDtypeStruct((B, 1, m_pad), f32),  # z
        jax.ShapeDtypeStruct((B, 1, m_pad), f32),  # y
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),  # status
        jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),  # iters
        jax.ShapeDtypeStruct((B, 1, 1), f32),  # pres
        jax.ShapeDtypeStruct((B, 1, 1), f32),  # dres
    )
    out_specs = (
        pl.BlockSpec((1, 1, n_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
    )

    kernel = functools.partial(_admm_kernel, prm, n_pad, m_pad)
    # x32 tracing semantics regardless of the caller's jax_enable_x64 (see
    # the shared-kernel call above)
    with jax.enable_x64(False):
        x, z, y, status, iters, pres, dres = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)

    return (
        x[:, 0, :n],
        z[:, 0, :m],
        y[:, 0, :m],
        status[:, 0, 0],
        iters[:, 0, 0],
        pres[:, 0, 0],
        dres[:, 0, 0],
    )
