"""Quadratic-program problem and solution types.

TPU-native analog of the reference's qp.hpp: the problem is a pytree of dense
fixed-shape arrays

    min_x  0.5 x' P x + q' x
    s.t.   l <= A x <= u

(the reference's sparse variant, qp.hpp:60-79, is replaced by dense
block-banded structure — XLA/MXU prefer dense tiles over scalar sparsity).
Batches of QPs are leading axes on every field.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class QuadraticProgram(NamedTuple):
    """Dense QP data; cf. reference qp.hpp:31-45."""

    P: jax.Array  # (n, n) cost quadratic (only symmetric part matters)
    q: jax.Array  # (n,)   cost linear
    A: jax.Array  # (m, n) constraint matrix
    l: jax.Array  # (m,)   lower bounds (-inf allowed)
    u: jax.Array  # (m,)   upper bounds (+inf allowed)


class QPSolutionStatus(enum.IntEnum):
    """Solver return codes; same meanings as reference qp.hpp:82-92."""

    Optimal = 0
    PolishFailed = 1
    PrimalInfeasible = 2
    DualInfeasible = 3
    MaxIterations = 4
    MaxTime = 5  # produced by the host-level budget wrapper solve_qp_timed
    Unknown = 6
    # internal sentinel: still iterating (never returned)
    Running = -1


class QPSolution(NamedTuple):
    """Solution pytree; cf. reference qp.hpp:95-108 plus residual observability."""

    primal: jax.Array  # (n,)
    dual: jax.Array  # (m,)
    status: jax.Array  # int32 scalar, a QPSolutionStatus value
    iters: jax.Array  # int32 scalar
    objective: jax.Array  # scalar
    primal_res: jax.Array  # inf-norm primal residual at last stopping check
    dual_res: jax.Array  # inf-norm dual residual at last stopping check


@dataclasses.dataclass(frozen=True)
class QPSolverParams:
    """ADMM solver options (jit-static); defaults match reference
    qp_solver.hpp:29-68."""

    alpha: float = 1.6  # relaxation
    rho: float = 0.1  # base dual step size
    # Equality rows use rho_eq_scale * rho (reference hard-codes 1e3,
    # qp_solver.hpp:361-374).  Exposed because the product bounds the KKT
    # condition number, which is what f32 TPU solves can resolve: raising
    # ``rho`` for faster active-set convergence while lowering this keeps
    # cond(P + sigma I + A' diag(rho) A) inside f32 range.
    rho_eq_scale: float = 1e3
    sigma: float = 1e-6  # primal regularization
    scaling: bool = True  # modified-Ruiz equilibration
    eps_abs: float = 1e-3
    eps_rel: float = 1e-3
    eps_primal_inf: float = 1e-4
    eps_dual_inf: float = 1e-4
    max_iter: int = 4000  # jit needs a finite bound (reference: optional)
    stop_check_iter: int = 25  # iterations between convergence checks
    polish: bool = True
    polish_iter: int = 5
    delta: float = 1e-6  # polish regularization
    # Extra iterative-refinement sweeps on each KKT solve. The solver already
    # forces full-f32 matmul precision on TPU; refinement is only needed when
    # pushing f32 toward ~1e-6 tolerances. No reference analog (f64-only).
    kkt_refine_iters: int = 0
    # Iteration-loop backend:
    #   "xla"    batched einsums, any dtype;
    #   "pallas" fused TPU kernel keeping each problem's matrices in VMEM
    #            across the whole iteration (float32 only, interpret mode
    #            off-TPU);
    #   "lane"   batch-TRAILING layout for fleets of TINY per-problem QPs
    #            (n <= ~16): matrices stored (m, n, B) so the batch rides the
    #            TPU lanes instead of padding n -> 128 (~40x less HBM traffic
    #            per iteration at n=3).  Scaling, factorization, iteration,
    #            and stopping checks all run trailing; polish and finalize
    #            are batch-leading one-time costs.  Per-problem factors only
    #            (shared-factor batches fall through to the XLA GEMM path).
    backend: str = "xla"
    # Problems per grid step in the shared-matrix Pallas kernel (the GEMM
    # row-block height).  Larger blocks amortize the shared-matrix load and
    # grow the MXU GEMMs, at the cost of coupling more problems to the
    # slowest member's iteration count.
    pallas_block: int = 128
    # Shared-matrix Pallas path: permute the batch by the warmstart's
    # previous iteration counts before blocking.  Each grid block's
    # while_loop runs until its SLOWEST member converges; in warmstarted
    # closed loops per-member difficulty persists across steps, so sorting
    # clusters the stragglers into few blocks instead of making every block
    # pay the straggler price.  Results are inverse-permuted (exact — the
    # problems are independent).  No reference analog (serial solver).
    sort_stragglers: bool = False
    # Residual-balancing rho adaptation at stopping checks (OSQP sec. 5.2;
    # the reference's embedded solver has static rho only): per element,
    # rho <- rho * sqrt(pres_norm / dres_norm) when the normalized residuals
    # are imbalanced beyond adaptive_rho_tol, refactorizing the reduced KKT
    # in-loop.  Supported on the "lane" and "xla" backends with per-problem
    # factors (shared-factor fleets share one rho; the fused Pallas kernel
    # pins its factorization in VMEM); turns persistent ADMM stragglers
    # (e.g. barrier-active ASIF members, badly-conditioned SQP subproblems)
    # from hundreds of iterations into tens.
    adaptive_rho: bool = False
    adaptive_rho_tol: float = 5.0
    # Compensated (two-float) evaluation of the optimality residuals in the
    # stopping check (utils/compensated.py).  Plain-f32 residual evaluation
    # carries ~eps * |P||x| * sqrt(n) accumulation noise (~1e-5 at n = 64),
    # which FLOORS the measurable dual residual: iterates that have truly
    # converged below eps_abs = 1e-6 still report MaxIterations.  Compensated
    # accumulation removes the evaluation floor at a few-x cost paid only
    # every stop_check_iter iterations ("xla" and "lane" backends; the fused
    # Pallas kernel keeps plain in-loop checks — use the SQP-level
    # compensated_kkt certificate there).  With polish=True it additionally
    # re-certifies the polished point (whose iterative refinement is
    # compensated unconditionally) and upgrades MaxIterations members whose
    # polished KKT point truly passes — this is how f32 solves certify below
    # the ADMM iterate's own ~2e-5 stall floor.  The reported primal_res /
    # dual_res of polished members are re-measured at the returned point.
    # No reference analog (f64-only solver).
    compensated_check: bool = False
    # Print batch residual summaries at every stopping check (the analog of
    # the reference's verbose iteration rows, qp_solver.hpp:409-419); uses
    # jax.debug.print, xla and lane backends (CPU-only under the axon plugin).
    verbose: bool = False


def random_qp(
    key: jax.Array,
    n: int,
    m: int,
    density: float = 1.0,
    dtype=jnp.float64,
) -> QuadraticProgram:
    """Random feasible-ish QP in the style of the reference benchmark
    (benchmarks/bench.cpp random problem generator): P = M M' (PSD), random A,
    bounds straddling A x0 for a random x0."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    M = jax.random.normal(k1, (n, n), dtype=dtype)
    if density < 1.0:
        mask = jax.random.bernoulli(k6, density, (n, n))
        M = M * mask
    P = M @ M.T
    q = jax.random.normal(k2, (n,), dtype=dtype)
    A = jax.random.normal(k3, (m, n), dtype=dtype)
    x0 = jax.random.normal(k4, (n,), dtype=dtype)
    center = A @ x0
    spread = jnp.abs(jax.random.normal(k5, (m,), dtype=dtype)) + 0.1
    return QuadraticProgram(P=P, q=q, A=A, l=center - spread, u=center + spread)


def warmstart_like(qp: QuadraticProgram) -> QPSolution:
    """Zero warmstart with shapes matching ``qp``."""
    n = qp.A.shape[-1]
    m = qp.A.shape[-2]
    dt = qp.A.dtype
    z = jnp.zeros((), dtype=dt)
    return QPSolution(
        primal=jnp.zeros(qp.A.shape[:-2] + (n,), dt),
        dual=jnp.zeros(qp.A.shape[:-2] + (m,), dt),
        status=jnp.full(qp.A.shape[:-2], QPSolutionStatus.Unknown, jnp.int32),
        iters=jnp.zeros(qp.A.shape[:-2], jnp.int32),
        objective=jnp.zeros(qp.A.shape[:-2], dt),
        primal_res=jnp.zeros(qp.A.shape[:-2], dt),
        dual_res=jnp.zeros(qp.A.shape[:-2], dt),
    )


Warmstart = Optional[QPSolution]
