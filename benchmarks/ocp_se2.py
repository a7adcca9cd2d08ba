#!/usr/bin/env python
"""Batched SE(2) collocation OCP sweep (BASELINE config 5).

A fleet of SE(2) optimal-control problems (the examples/ocp_se2.hpp problem
with varying tracked screw velocities) transcribed on a fixed LGR mesh and
solved as one vmapped batch of SQP solves on the accelerator.  The reference
solves such problems one at a time through Ipopt; here the entire sweep is a
single compiled program.
"""

import time

import jax

jax.config.update("jax_enable_x64", True)  # SQP inner tolerances need f64
# f64 runs on host: the 1e-6 NLP protocol needs f64, and TPU f64 emulation
# faults on this program shape.  TPU f32 note (measured): the same sweep at
# tol 2e-4 converges on-device (99.8% Optimal over 640 problems) since the
# solver-wide full-matmul-precision fix, but sweep throughput there is
# lockstep-bound — the vmapped nested while_loops (SQP around a 4000-cap
# ADMM) advance at the slowest member's pace, so batched *transcribed-QP*
# workloads (bench.py) are the TPU throughput story, not batched SQP.
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.groups import SE2, Bundle, Rn
from smooth_feedback_tpu.ocp import OCP, flatten_ocp, nlp_initial_guess, ocp_to_nlp
from smooth_feedback_tpu.ocp.collocation import Mesh
from smooth_feedback_tpu.solvers import SQPParams, solve_nlp_sqp

X = Bundle(SE2, Rn(2))
U = Rn(2)


def make_flat_nlp(mesh, vel):
    """Flat NLP for one tracked screw velocity (traced; vel may be batched)."""

    def xdes(t):
        return jnp.concatenate([SE2.exp(t * vel), jnp.stack([vel[0], vel[2]])])

    def f(t, x, u):
        return jnp.stack([x[4], jnp.zeros(()), x[5], u[0], u[1]])

    def g(t, x, u):
        e = X.rminus(x, xdes(t))
        return jnp.array([0.5 * (e @ e + u @ u)])

    ocp = OCP(
        X=X, U=U,
        theta=lambda tf, x0, xf, q: tf + q[0],
        f=f, g=g,
        cr=lambda t, x, u: u,
        crl=jnp.array([-1.0, -1.0]),
        cru=jnp.array([1.0, 1.0]),
        ce=lambda tf, x0, xf, q: jnp.concatenate(
            [tf[None], X.log(x0) - jnp.concatenate([jnp.zeros(3), jnp.stack([vel[0], vel[2]])])]
        ),
        cel=jnp.array([5.0, 0, 0, 0, 0, 0]),
        ceu=jnp.array([5.0, 0, 0, 0, 0, 0]),
    )
    flat = flatten_ocp(ocp, lambda t: X.identity(), lambda t: jnp.full(2, 0.01))
    return ocp_to_nlp(flat, mesh)


def main(B=16):
    mesh = Mesh.uniform(3, 5)  # compile cost grows quickly with mesh size
    key = jax.random.PRNGKey(0)
    vels = jnp.stack(
        [
            1.0 + 0.3 * jax.random.normal(key, (B,)),
            jnp.zeros(B),
            0.5 + 0.2 * jax.random.normal(jax.random.PRNGKey(1), (B,)),
        ],
        axis=1,
    )  # (B, 3) screw velocities to track

    prm = SQPParams(max_iter=120, tol=1e-6)
    # NOTE: the vmapped SQP program is compile-heavy (~5-10 min); runtime is fast

    def solve_one(vel):
        nlp = make_flat_nlp(mesh, vel)
        # initial guess: tf = 5, zero deviations
        z0 = jnp.zeros((nlp.n,)).at[0].set(5.0)
        sol = solve_nlp_sqp(nlp, z0, prm)
        return sol.status, sol.iters, sol.kkt_res, sol.objective

    sweep = jax.jit(jax.vmap(solve_one))
    t0 = time.perf_counter()
    st, it, kkt, obj = sweep(vels)
    jax.block_until_ready(st)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    st, it, kkt, obj = sweep(vels)
    jax.block_until_ready(st)
    dt = time.perf_counter() - t0

    st = np.asarray(st)
    print(f"batched SE(2) OCP sweep: B={B}, mesh {mesh.N_ivals}x5, "
          f"compile {t_compile:.0f}s, run {dt:.2f}s -> {B / dt:.1f} OCP solves/sec")
    print(f"optimal: {np.mean(st == 0) * 100:.0f}%, iters p50/max "
          f"{int(np.median(np.asarray(it)))}/{int(np.max(np.asarray(it)))}, "
          f"max kkt {float(np.max(np.asarray(kkt))):.1e}")


if __name__ == "__main__":
    main()
