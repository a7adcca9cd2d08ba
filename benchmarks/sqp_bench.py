#!/usr/bin/env python
"""SQP throughput benchmark: a vmapped fleet of nonconvex NLPs, plus a
micro-benchmark of the convexification step (shifted-Cholesky trial loop vs
the full eigendecomposition it replaced).

The fleet problem is a constrained Rosenbrock chain of dimension n — the
Lagrangian Hessian is indefinite away from the solution, so every SQP
iteration exercises the convexification path.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.ocp.nlp import NLP, NLPSolutionStatus
from smooth_feedback_tpu.solvers import SQPParams, solve_nlp_sqp
from smooth_feedback_tpu.qp import QPSolverParams
from smooth_feedback_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # identical re-runs skip the TPU compile


def make_nlp(n, dtype=jnp.float64):
    """Rosenbrock chain with a coupling equality and box bounds."""

    def f(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)

    def g(x):
        return jnp.array([jnp.sum(x) - 0.9 * n, x[0] * x[1]])

    inf = jnp.asarray(jnp.inf, dtype)
    return NLP(
        n=n,
        m=2,
        f=f,
        g=g,
        xl=-5.0 * jnp.ones(n, dtype),
        xu=5.0 * jnp.ones(n, dtype),
        gl=jnp.array([0.0, -inf], dtype),
        gu=jnp.array([0.0, 2.0], dtype),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    n, B = args.n, args.batch
    dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    nlp = make_nlp(n, dt)
    prm = SQPParams(max_iter=150, tol=1e-6)

    x0s = 0.9 + 0.2 * jax.random.normal(jax.random.PRNGKey(0), (B, n), dt)
    solve = jax.jit(jax.vmap(lambda x0: solve_nlp_sqp(nlp, x0, prm)))

    t0 = time.perf_counter()
    sol = solve(x0s)
    jax.block_until_ready(sol.x)
    compile_and_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    sol = solve(x0s)
    jax.block_until_ready(sol.x)
    run = time.perf_counter() - t0
    st = np.asarray(sol.status)
    iters = np.asarray(sol.iters)
    total_iters = int(iters.sum())
    print(
        f"fleet SQP: n={n} B={B} optimal={np.mean(st == NLPSolutionStatus.Optimal) * 100:.0f}% "
        f"iters p50={np.median(iters):.0f} total={total_iters}"
    )
    print(
        f"  wall {run * 1e3:.0f} ms -> {B / run:.1f} NLP solves/s, "
        f"{total_iters / run:.0f} SQP iters/s (compile+first {compile_and_first:.1f}s)"
    )

    # ---- convexification micro-bench: trial Cholesky vs eigendecomposition
    key = jax.random.PRNGKey(1)
    M = jax.random.normal(key, (B, n, n), dt)
    H = 0.5 * (M + jnp.swapaxes(M, 1, 2))  # indefinite

    @jax.jit
    def via_chol(H):
        eye = jnp.eye(n, dtype=dt)

        def one(Hi):
            def cond(c):
                tau, ok = c
                return jnp.logical_and(~ok, tau < 1e8)

            def body(c):
                tau, _ = c
                t2 = 10.0 * tau
                return t2, jnp.isfinite(jnp.linalg.cholesky(Hi + t2 * eye)).all()

            ok0 = jnp.isfinite(jnp.linalg.cholesky(Hi + 1e-6 * eye)).all()
            tau, _ = jax.lax.while_loop(cond, body, (jnp.asarray(1e-6, dt), ok0))
            return Hi + tau * eye

        return jax.vmap(one)(H)

    @jax.jit
    def via_eigh(H):
        lam = jnp.linalg.eigvalsh(H)[:, 0]
        shift = jnp.maximum(0.0, -lam) + 1e-6
        return H + shift[:, None, None] * jnp.eye(n, dtype=dt)

    for name, fn in (("shifted-cholesky", via_chol), ("eigvalsh", via_eigh)):
        r = fn(H)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(10):
            r = fn(H)
        jax.block_until_ready(r)
        print(f"  convexify {name}: {(time.perf_counter() - t0) / 10 * 1e3:.1f} ms/batch")


if __name__ == "__main__":
    main()
