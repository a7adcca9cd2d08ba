"""Closed-form FLOP accounting for the solver hot paths (MFU denominators).

The reference publishes only relative performance (a QP-time plot vs OSQP,
README.md:208-214); this framework's claims are absolute throughputs on fixed
TPU hardware, which need a hardware denominator to mean anything.  These
models count the NOMINAL algorithm FLOPs (the useful work — the scaling-book
MFU convention), not the padded/lane-replicated work the device actually
executes: lane padding waste therefore shows up honestly as LOW utilization,
never as inflated FLOP/s.

Conventions:

* a fused multiply-add counts as 2 FLOPs;
* matvec (m, n) @ (n,) = 2mn; GEMM (a, b) @ (b, c) = 2abc;
* Cholesky of n x n = n^3/3; triangular solve against an n-vector = n^2
  MACs = 2n^2 FLOPs (n^3 against an n x n identity block);
* O(n + m) elementwise work in the ADMM update is counted with a small
  constant (it is HBM-bound, not FLOP-bound, but free to tally).

Peak: TPU v5e = 197 TFLOP/s bf16 (394 TOPS int8).  Every numeric entry
point in this package runs its matmuls at ``jax.default_matmul_precision
("highest")``, which on TPU decomposes each f32 x f32 product into 6 bf16
MXU passes — so an f32-highest program's *nominal*-FLOP utilization ceiling
is ~1/6 of the bf16 peak (~16.4%).  ``mfu_pct`` is reported against the raw
bf16 peak (the hardware's speed of light), with this ceiling documented
rather than baked in.
"""

from __future__ import annotations

# TPU v5e peak, bf16 FLOP/s (the hardware speed-of-light denominator).
V5E_PEAK_BF16 = 197e12
# Nominal-FLOP ceiling for f32 matmuls at default_matmul_precision("highest")
# (6 bf16 MXU passes per f32 product).
F32_HIGHEST_CEILING = 1.0 / 6.0

_PEAKS = {"tpu": V5E_PEAK_BF16}


def admm_iter_flops(n: int, m: int, refine_iters: int = 0) -> float:
    """Nominal FLOPs of ONE ADMM iteration of the reduced-KKT solver
    (qp/solver.py body): A^T matvec + A matvec (2 x 2mn), the cached-inverse
    KKT solve (2n^2), ``refine_iters`` rounds of iterative refinement (one
    Mred matvec + one Minv matvec each, 4n^2), and the relaxed
    update/clip/dual elementwise tail (~12(n + m))."""
    return 4.0 * m * n + 2.0 * n * n * (1 + 2 * refine_iters) + 12.0 * (n + m)


def admm_factor_flops(n: int, m: int) -> float:
    """Nominal FLOPs of one reduced-KKT factorization (qp/solver.py
    _factorize): the A^T rho A Gram product (2mn^2), Cholesky (n^3/3), and
    the explicit SPD inverse via two triangular solves against I (2n^3)."""
    return 2.0 * m * n * n + n**3 / 3.0 + 2.0 * n**3


def admm_check_flops(n: int, m: int) -> float:
    """Nominal FLOPs of one unscaled-residual stopping check
    (qp/solver.py _stopping_check): Ax, Px, A^T y, plus the infeasibility
    certificates' A^T dy, P dx, A dx (six matvecs)."""
    return 6.0 * 2.0 * m * n


def qp_solve_flops(
    n: int,
    m: int,
    iters: float,
    *,
    checks: float = 0.0,
    factorizations: float = 1.0,
    refine_iters: int = 0,
) -> float:
    """Total nominal FLOPs of one QP solve: ``iters`` ADMM iterations,
    ``checks`` stopping checks, ``factorizations`` reduced-KKT factor+invert
    passes (0 with ``reuse_factors``; 1 + refactor count with adaptive
    rho)."""
    return (
        iters * admm_iter_flops(n, m, refine_iters)
        + checks * admm_check_flops(n, m)
        + factorizations * admm_factor_flops(n, m)
    )


def condensed_mpc_transcribe_flops(n: int, m: int, xL: int, nx: int) -> float:
    """Nominal per-member FLOPs of the condensed MPC vectors-only
    transcription + state recovery (controllers/mpc.py
    fleet_shared_t_condensed): wx = b0 @ C0b^T (2 nx xL), q_c = wx @ M1^T
    (2 xL n), the constraint-bound shift (2 xL m), the objective offset
    quadratic (2 xL^2 + 2 xL), and the x-trajectory recovery Wx @ primal
    (2 xL n)."""
    return (
        2.0 * nx * xL + 2.0 * xL * n + 2.0 * xL * m + 2.0 * xL * xL + 4.0 * xL * n
    )


def device_peak_flops(platform: str) -> float | None:
    """Peak FLOP/s for the given jax platform (None if unknown — MFU is
    only meaningful on accelerators with a published peak)."""
    return _PEAKS.get(platform)


def mfu_pct(total_flops: float, seconds: float, platform: str = "tpu"):
    """Model-FLOP utilization in percent: nominal FLOPs / (peak x time).
    Returns None when the platform has no known peak (e.g. CPU runs)."""
    peak = device_peak_flops(platform)
    if peak is None or seconds <= 0:
        return None
    return 100.0 * total_flops / (peak * seconds)
