#!/usr/bin/env python
"""Batched SE(2) collocation OCP sweep (BASELINE config 5).

A fleet of SE(2) optimal-control problems (the examples/ocp_se2.hpp problem
with varying tracked screw velocities) transcribed on a fixed LGR mesh and
solved as one vmapped batch of SQP solves.  The reference solves such
problems one at a time through Ipopt (compat/ipopt.hpp:298,
examples/ocp_se2_nlp.cpp:47-91); here the entire sweep is a single compiled
program.

Two protocols, selected by CLI flag:

  python benchmarks/ocp_se2.py            # CPU f64, SQP tol 1e-6 (the
                                          # reference-parity accuracy protocol)
  python benchmarks/ocp_se2.py --tpu      # real-TPU f32, tol 1e-2 (the
                                          # on-device throughput protocol;
                                          # f64 emulation faults on this
                                          # program shape)

Each prints one JSON line with throughput and optimal%.
"""

import json
import sys
import time

TPU = "--tpu" in sys.argv
VMAP = "--vmap" in sys.argv  # measure the vmapped solver for comparison
# Inner-QP iteration backend for the TPU protocol (A/B knob): "xla" streams
# the (B, n, n) stacks from HBM each ADMM iteration; "pallas" pins each
# problem's matrices in VMEM across the whole iteration.
BACKEND = next(
    (a.split("=", 1)[1] for a in sys.argv if a.startswith("--backend=")), "xla"
)
# Inner-ADMM iteration cap (TPU protocol A/B knob).  In f32 the ADMM iterate
# stalls at ~2e-5 well before eps=1e-6, so every subproblem runs to this cap
# regardless; certification comes from the compensated polish re-check.  The
# cap therefore sets the throughput almost directly — the knob measures how
# far it can drop before subproblem (hence dual) quality degrades.
QPCAP = int(
    next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--qpcap=")), 1200)
)
# Fleet chunk size (0 = unchunked).  Default: sequential chunks of 64 —
# per-iteration cost is HBM-linear in the lockstep width while the iteration
# count is the width's worst member, so one-shot fleets ANTI-scale past
# B~64 (docs/TUNING.md "Fleet-size knee"; measured 63 solves/s at B=64 vs
# 15.2 at B=256 unchunked).  Chunking also pins compile cost at chunk size.
CHUNK = int(
    next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--chunk=")), 64)
)
# Rescue pass (--no-rescue disables): re-solve non-Optimal members solo with
# boosted budgets after each timed rep (rescue wall time COUNTS toward that
# rep's throughput — the recorded number includes converging the tail).
RESCUE = "--no-rescue" not in sys.argv
# Per-member total inner-ADMM budget (0 = unbounded).  Converging members'
# p99 is ~34k (--hist); a pathological member otherwise burns max_iter x
# qpcap = 72k in lockstep while its chunk-mates sit frozen.  Exhausted
# members freeze as IterationLimit and the rescue pass re-solves them solo.
BUDGET = int(
    next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--budget=")), 36000)
)
# Difficulty-probe SQP iterations for chunked fleets (0 = no probe): sorts
# members into chunks by observed difficulty so stragglers share a chunk.
PROBE = int(
    next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--probe=")), 3)
)
# Stall freeze (0 = off = the recorded protocol): freeze a member whose KKT
# has not halved for this many consecutive SQP iterations.  Measured A/B at
# B=256 (OCP_SWEEP.json stall=10 row): freezing cuts the sweep 10.5 -> 6.2
# s/rep but triages 23 members/rep (vs 8 budget-exhausted without it) into
# the rescue at ~2.8 s each — the frozen members are mostly SLOW BUT
# CONVERGING, and finishing them in cheap lockstep beats rescuing them
# (value 32.4 -> 4.0).  Freezing pays off only when divergence is common;
# this sweep's tail is slow convergence, so the protocol leaves it off.
STALL = int(
    next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--stall=")), 0)
)
# Rescue tuning knobs (A/B; defaults are the recorded protocol)
RBUDGET = float(
    next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--rbudget=")), 4)
)
RSTALL = int(
    next((a.split("=", 1)[1] for a in sys.argv if a.startswith("--rstall=")), 3)
)

import jax

if not TPU:
    jax.config.update("jax_enable_x64", True)  # 1e-6 SQP tolerances need f64
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.groups import SE2, Bundle, Rn
from smooth_feedback_tpu.ocp import OCP, flatten_ocp, nlp_initial_guess, ocp_to_nlp
from smooth_feedback_tpu.ocp.collocation import Mesh
from smooth_feedback_tpu.qp import QPSolverParams
from smooth_feedback_tpu.solvers import (
    SQPParams,
    rescue_nonoptimal,
    solve_nlp_sqp_batch,
)
from smooth_feedback_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # identical re-runs skip the ~9 min TPU compile

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


def _random_vels(key, B):
    k1, k2 = jax.random.split(key)
    return jnp.stack(
        [
            1.0 + 0.3 * jax.random.normal(k1, (B,)),
            jnp.zeros(B),
            0.5 + 0.2 * jax.random.normal(k2, (B,)),
        ],
        axis=1,
    )


def main(B=None):
    mesh = Mesh.uniform(3, 5)  # compile cost grows quickly with mesh size

    if TPU:
        B = B or 64
        # f32 on-device protocol at tol 1e-4 (was 1e-2 in round 3; the jump
        # below the old f32 floor comes from four solver changes measured on
        # this sweep: compensated KKT stationarity + compensated polish
        # refinement (utils/compensated.py — f64-like accumulation from pure
        # f32 ops), the Han-Powell full dual step, and the non-monotone
        # watchdog line search breaking the Maratos stall).  The 1e-6
        # protocol is the CPU f64 run.
        # qp max_iter: with the natively batched SQP the inner ADMM loop
        # exits as soon as every member's subproblem converges, so this cap
        # only binds members that stall at the f32 residual floor.  (On the
        # older vmapped form — no early exit — the sweep was ~linear in the
        # cap: 4000 -> 10.2 solves/s, 1200 -> 26.5 at B=64, which is why it
        # sits at 1200; re-tune against qp_iters_p50/max in the output.)
        chunked = bool(CHUNK) and B > CHUNK
        prm = SQPParams(
            max_iter=60, tol=1e-4, compensated_kkt=True,
            chunk_size=CHUNK if chunked else None,
            qp_budget=BUDGET or None,
            stall_iters=STALL or None,
            probe_iters=PROBE if chunked else 0,
            probe_qp_cap=300,
            qp=QPSolverParams(
                eps_abs=1e-6, eps_rel=1e-6, max_iter=QPCAP, polish=True,
                kkt_refine_iters=1, backend=BACKEND,
                # plain-f32 stopping checks FLOOR the measurable dual
                # residual at ~1e-5 (> eps_abs), so without this every
                # subproblem runs to the 1200-iteration cap: measured
                # p50 ~1071 inner iterations per SQP step at B=64.  The
                # compensated check certifies true 1e-6 exits instead.
                compensated_check=True,
                # adaptive_rho measured 2.3x SLOWER here on TPU (12.6 vs
                # 29.0 solves/s): each stopping-check refactorization is a
                # fresh Cholesky while the straggler iterations it saves are
                # cheap GEMMs.  (On the CPU f64 protocol it HELPS — 8.3x
                # fewer straggler iterations — because factorization is
                # relatively cheaper there.  Device-dependent knob.)
            ),
        )
    else:
        B = B or 16
        prm = SQPParams(max_iter=120, tol=1e-6)
    # NOTE: the batched SQP program is compile-heavy (~a minute); runtime is fast

    # Natively batched SQP (one scalar loop over the fleet), NOT
    # jax.vmap(solve_nlp_sqp): vmap lowers every solver branch to a
    # both-branches select and erases the inner QP's early exit, measured
    # 4.4x slower at 2x the compile time on this sweep (CPU f64, B=8).
    # Pass --vmap to measure the vmapped form for comparison.
    if VMAP:
        from smooth_feedback_tpu.solvers import solve_nlp_sqp

        def sweep_fn(vels):
            def solve_one(vel):
                nlp = make_flat_nlp(mesh, vel)
                z0 = jnp.zeros((nlp.n,)).at[0].set(5.0)
                sol = solve_nlp_sqp(nlp, z0, prm)
                return (
                    sol.status, sol.iters, sol.kkt_res, sol.objective,
                    sol.qp_iters, sol.x,
                )

            return jax.vmap(solve_one)(vels)

    else:

        def sweep_fn(vels):
            n = make_flat_nlp(mesh, jax.tree.map(lambda a: a[0], vels)).n
            # initial guess: tf = 5, zero deviations
            z0 = jnp.zeros((vels.shape[0], n)).at[:, 0].set(5.0)
            sol = solve_nlp_sqp_batch(
                lambda vel: make_flat_nlp(mesh, vel), vels, z0, prm
            )
            return (
                sol.status, sol.iters, sol.kkt_res, sol.objective,
                sol.qp_iters, sol.x,
            )

    sweep = jax.jit(sweep_fn)
    t0 = time.perf_counter()
    st, it, kkt, obj, qpi, xs = sweep(_random_vels(jax.random.PRNGKey(0), B))
    _ = np.asarray(st)  # host-transfer barrier
    t_compile = time.perf_counter() - t0

    # Rescue: re-solve non-Optimal members solo with boosted budgets
    # (solvers.rescue_nonoptimal) — the fleet analog of the reference
    # iterating Ipopt to convergence per problem (ocp_se2_nlp.cpp:47-91).
    # The sweep returns tuples, so rebuild the minimal NLPSolution the
    # rescue helper needs and re-extract the tuple after the merge.
    def run_rescue(vels, st, it, kkt, obj, qpi, xs):
        from smooth_feedback_tpu.ocp.nlp import NLPSolution

        bad = np.flatnonzero(np.asarray(st) != 0)
        if bad.size == 0 or not RESCUE:
            return st, it, kkt, obj, qpi, 0
        make = lambda vel: make_flat_nlp(mesh, vel)
        nvar = make(vels[0]).n
        # stage 1 warmstarts from the fleet's last iterate (xs); the cold
        # z0 seeds stage 2's multistart ladder for members whose fleet
        # iterate sits in a divergent basin
        z0 = jnp.zeros((vels.shape[0], nvar)).at[:, 0].set(5.0)
        sol = NLPSolution(
            status=jnp.asarray(st), iters=jnp.asarray(it), x=jnp.asarray(xs),
            zl=jnp.zeros_like(z0), zu=jnp.zeros_like(z0),
            lam=jnp.zeros((vels.shape[0], make(vels[0]).m), z0.dtype),
            objective=jnp.asarray(obj), kkt_res=jnp.asarray(kkt),
            qp_iters=jnp.asarray(qpi),
        )
        # adaptive_rho=True: rescue members are mostly cap-stalled-ADMM
        # cases; rho adaptation converges those subproblems instead of
        # burning cap x budget (measured 22 s/rep of rescue without it),
        # and the wide-fleet objection to it (refactorization cost) does
        # not apply at multistart width.  The ultra-tail members need DEEP
        # total budgets to converge at all (budget_scale 1 measured: they
        # exhaust 36k/candidate and stay failed), so the budget stays deep
        # and the stall window loosens — cost control comes from adaptive
        # rho actually converging the subproblems.
        merged, n_resc = rescue_nonoptimal(
            make, vels, sol, prm, x0_cold=z0, budget_scale=RBUDGET,
            adaptive_rho=True, stall_scale=RSTALL,
        )
        return (
            np.asarray(merged.status), np.asarray(merged.iters),
            np.asarray(merged.kkt_res), np.asarray(merged.objective),
            np.asarray(merged.qp_iters), n_resc,
        )

    # warm the rescue program outside the timed reps (compile only; its
    # RUNTIME is charged to each rep below)
    if RESCUE and bool(np.any(np.asarray(st) != 0)):
        run_rescue(
            _random_vels(jax.random.PRNGKey(0), B), st, it, kkt, obj, qpi, xs
        )

    # FRESH inputs per timed rep: the tunnel memoizes identical dispatches
    best = np.inf
    n_rescued = 0
    sweep_s = rescue_s = 0.0
    all_st, all_it, all_kkt, all_qpi = [], [], [], []
    for rep in range(3):
        vels = _random_vels(jax.random.PRNGKey(100 + rep), B)
        t0 = time.perf_counter()
        st, it, kkt, obj, qpi, xs = sweep(vels)
        st = np.asarray(st)  # host-transfer barrier
        t1 = time.perf_counter()
        st, it, kkt, obj, qpi, nr = run_rescue(vels, st, it, kkt, obj, qpi, xs)
        t2 = time.perf_counter()
        best = min(best, t2 - t0)
        sweep_s += t1 - t0
        rescue_s += t2 - t1
        n_rescued += nr
        all_st.append(np.asarray(st))
        all_it.append(np.asarray(it))
        all_kkt.append(np.asarray(kkt))
        all_qpi.append(np.asarray(qpi))

    st = np.concatenate(all_st)
    it = np.concatenate(all_it)
    kkt = np.concatenate(all_kkt)
    qpi = np.concatenate(all_qpi)
    # Nominal-FLOP accounting (utils/flops.py): the inner ADMM linear
    # algebra of every subproblem — iterations, one factorization + one
    # stopping check per measured-available unit — a LOWER bound (SQP
    # derivative evaluation / transcription FLOPs are not modeled).  The
    # subproblem QP has n variables and m + n constraint rows (bounds are
    # rows for the ADMM form).
    from smooth_feedback_tpu.utils import mfu_pct, qp_solve_flops

    nlp0 = make_flat_nlp(mesh, _random_vels(jax.random.PRNGKey(0), 1)[0])
    nn, mm = nlp0.n, nlp0.m + nlp0.n
    per_member = [
        qp_solve_flops(
            nn, mm, float(q),
            checks=float(q) / max(prm.qp.stop_check_iter, 1),
            factorizations=float(i),
            refine_iters=prm.qp.kkt_refine_iters,
        )
        for q, i in zip(qpi, it)
    ]
    flops_est = float(np.sum(per_member)) / max(len(all_st), 1)  # per rep
    device = jax.devices()[0].platform
    mfu = mfu_pct(flops_est, best, device)

    out = {
        "metric": "se2_ocp_sqp_solves_per_sec",
        "value": round(B / best, 2),
        # mean-based aggregate over ALL reps (value uses the best rep; at
        # small B a lucky failure-free rep hides the rescue cost entirely,
        # while at large B every rep contains failures — value_mean is the
        # apples-to-apples batch-scaling number)
        "value_mean": round(B * 3 / max(sweep_s + rescue_s, 1e-9), 2),
        "unit": "OCP solves/sec",
        "batch": B,
        "optimal_pct": round(float(np.mean(st == 0) * 100.0), 2),
        "tol": prm.tol,
        "iters_p50": int(np.median(it)),
        # inner-ADMM totals: the vmapped sweep pays max() in lockstep, so
        # the p50/max gap is the straggler tax the qp max_iter cap bounds
        "qp_iters_p50": int(np.median(qpi)),
        "qp_iters_max": int(np.max(qpi)),
        "median_kkt": float(f"{np.median(kkt):.2e}"),
        "max_kkt": float(f"{np.max(kkt):.2e}"),
        "compile_s": round(t_compile, 1),
        # mean per-rep wall split: the fleet program vs the rescue pass
        # (both charged to throughput; the split localizes regressions)
        "sweep_s_mean": round(sweep_s / 3, 2),
        "rescue_s_mean": round(rescue_s / 3, 2),
        "solver": "vmapped" if VMAP else "batched",
        # recorded from the params actually built, not the CLI flags (the
        # CPU protocol ignores --backend/--qpcap/--chunk)
        "backend": prm.qp.backend,
        "qpcap": prm.qp.max_iter,
        "chunk": prm.chunk_size or 0,
        "qp_budget": prm.qp_budget or 0,
        "probe": prm.probe_iters,
        "stall": prm.stall_iters or 0,
        "rescued": n_rescued,
        # nominal inner-ADMM FLOPs per rep + model-FLOP utilization vs the
        # v5e bf16 peak (f32-highest matmuls cap nominal MFU at ~16.4%;
        # see utils/flops.py) — null on CPU (no published peak)
        "flops_est": float(f"{flops_est:.3e}"),
        "mfu_pct": None if mfu is None else float(f"{mfu:.4f}"),
        "device": device,
    }
    print(json.dumps(out))

    if "--hist" in sys.argv:
        # host-side straggler anatomy: percentiles + the worst members
        q = [50, 90, 99, 100]
        print("pct     iters  qp_iters       kkt")
        for p in q:
            print(
                f"p{p:<5} {np.percentile(it, p):6.0f} "
                f"{np.percentile(qpi, p):9.0f} {np.percentile(kkt, p):9.2e}"
            )
        worst = np.argsort(kkt)[-5:][::-1]
        for w in worst:
            print(
                f"member {w}: status {st[w]} iters {it[w]} "
                f"qp_iters {qpi[w]} kkt {kkt[w]:.2e}"
            )

    if "--record" in sys.argv:
        # checked-in machine artifact (cf. benchmarks/BENCH_SWEEP.json): one
        # entry per full config, newest wins.  The key includes every CLI
        # knob that changes the measured program (qpcap/tol/chunk — an A/B
        # run can no longer silently overwrite the canonical entry) and
        # tolerates hand-edited or pre-knob rows via .get defaults.
        import os

        path = os.path.join(os.path.dirname(__file__), "OCP_SWEEP.json")
        rows = json.load(open(path)) if os.path.exists(path) else []
        key = lambda r: (
            r.get("batch", 0),
            r.get("solver", "batched"),
            r.get("backend", "xla"),
            r.get("device", "tpu"),
            r.get("qpcap", 1200),
            r.get("tol", 1e-4),
            r.get("chunk", 0),
            r.get("qp_budget", 0),
            r.get("probe", 0),
            r.get("stall", 0),
        )
        rows = [r for r in rows if key(r) != key(out)] + [out]
        rows.sort(key=key)
        json.dump(rows, open(path, "w"), indent=1)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    main(int(args[0]) if args else None)
