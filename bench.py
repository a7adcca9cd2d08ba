#!/usr/bin/env python
"""Headline benchmark: batched 50-stage double-integrator MPC QP solves/sec.

This is the driver north-star config (BASELINE.json): repeatedly solve the
K=50-node double-integrator tracking MPC QP (examples/mpc_doubleintegrator.cpp
problem) for a batch of independent controllers on one TPU chip, in the
realistic warmstarted closed-loop regime.

The metric is gated on convergence: only fully Optimal steps count.  The
closed loop is chained on-device with ``lax.scan`` (NSCAN MPC steps per
dispatch) so the tunnel/dispatch latency of this host does not pollute the
per-solve number; every solve runs the full transcribe -> ADMM -> finalize
pipeline with warmstart carry, and the solved ``u`` drives the plant forward
(``x + dt f(x, u)``) so successive QPs see genuinely evolved states —
matching the reference's timing loop (mpc_doubleintegrator.cpp:69-91).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N,
   "optimal_pct": P}
where vs_baseline is relative to the 10,000 solves/sec target.

``python bench.py --sweep`` additionally runs the full configured table
(K in {50, 100, 200}, condensed + sparse, plus the K=50 sparse row) and
writes every row to ``benchmarks/BENCH_SWEEP.json`` — the machine-readable
artifact the README throughput table quotes (VERDICT r3 weak #1/next-#6).
stdout still carries exactly the one headline JSON line.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 8192  # fleet size (condensed true closed loop on v5e: 9.58M solves/s at
#           0.85 ms/step; 4.63M at B=2048, 2.84M at B=1024 — condensed GEMMs
#           are small enough that throughput still grows ~2x per doubling)
NSCAN = 100  # MPC steps chained per device dispatch (tunnel dispatch is
#              ~30 ms, so short chains are dispatch-bound)
K = 50  # horizon; override: python bench.py [K] [B].  K=100 (padded 384) runs
#         fused too via the raised per-kernel VMEM limit (measured: 827k
#         solves/s at B=4096, 100% Optimal — was 69.5k on the XLA fallback)


def run_config(K, B, condense=True, nscan=None):
    """Run one closed-loop config; returns the result dict (see module doc)."""
    from smooth_feedback_tpu.controllers import MPCParams, MPCWeights, make_mpc_step
    from smooth_feedback_tpu.groups import Rn
    from smooth_feedback_tpu.qp import QPSolverParams

    NSCAN_ = nscan or NSCAN
    dtype = jnp.float32
    X, U = Rn(2), Rn(1)
    f = lambda x, u: jnp.stack([x[1], u[0]])
    xdes = lambda t: jnp.stack([-0.5 * jnp.sin(0.3 * t), -0.15 * jnp.cos(0.3 * t)])
    udes = lambda t: jnp.zeros(1, dtype)

    step, ws0 = make_mpc_step(
        X,
        U,
        f,
        xdes,
        udes,
        weights=MPCWeights(
            Q=jnp.eye(2, dtype=dtype),
            Qtf=0.1 * jnp.eye(2, dtype=dtype),
            R=0.1 * jnp.eye(1, dtype=dtype),
        ),
        params=MPCParams(
            K=K,
            tf=5.0,
            return_trajectories=False,  # only u is consumed in the loop
            qp=QPSolverParams(
                scaling=True,
                polish=False,
                # rho=2 converges the saturated-input stragglers fast;
                # rho_eq_scale=15 keeps rho_eq at 30 so cond(KKT) stays
                # resolvable in f32 (measured: 100.00% Optimal in <=25 iters)
                rho=2.0,
                rho_eq_scale=15.0,
                # longer horizons need a deeper active-set tail
                max_iter=100 if K <= 50 else 200,
                stop_check_iter=10,  # checks are cheap GEMMs in the shared kernel
                backend="pallas",
                pallas_block=256,
                # sort_stragglers measured NEUTRAL-to-negative here (5.58 vs
                # 5.02 ms/step): closed-loop difficulty is too transient for
                # the previous-iters predictor, and the permutation gathers
                # cost ~0.5 ms.  Left off; the opt-in helps only fleets with
                # persistent per-member difficulty spreads.
            ),
        ),
        cr=lambda x, u: u,
        crl=jnp.array([-0.5], dtype),
        cru=jnp.array([0.5], dtype),
        dtype=dtype,
        reuse_factors=True,  # LTI problem: factorization is step-invariant
        # condensed MPC: states eliminated against the template at
        # construction, so the per-step QP is N*nu variables (padded 128 vs
        # 256) — EXACT same minimizer (tests/test_mpc.py parity) at ~6x the
        # sparse-form throughput.  The sinusoidal reference is NON-static:
        # each step pays one shared vectors-only template transcription
        # (allocate/update split; the P/A matrices are hoisted).
        condense=condense,
    )

    key = jax.random.PRNGKey(0)
    xs = 0.5 * jax.random.normal(key, (B, 2), dtype)
    wss = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), ws0)

    DT = 0.05  # plant step = clock step

    def chain_fn(ws, xs, t0):
        """NSCAN TRUE closed-loop MPC steps on a common clock (LTI fleet):
        each solve's u drives the double-integrator plant forward one Euler
        step, so successive QPs see evolved states, not just a shifted
        reference (cf. the reference's timing loop,
        examples/mpc_doubleintegrator.cpp:69-91)."""

        def body(carry, i):
            ws, xs = carry
            r = step.fleet_shared_t(ws, t0 + DT * i.astype(dtype), xs)
            xs = xs + DT * jnp.stack([xs[:, 1], r.u[:, 0]], axis=1)  # x+dt f(x,u)
            return (r.warmstart, xs), (r.status, r.warmstart.iters)

        return jax.lax.scan(body, (ws, xs), jnp.arange(NSCAN_))

    chain = jax.jit(chain_fn)

    span = NSCAN_ * DT  # chain duration; keep the fleet clock monotone
    # Compile cost as a first-class metric (round-over-round regressions
    # stay visible in the artifacts): compile_s is what THIS process paid
    # (cold, or persistent-disk-cache warm); warm_cache_s is a FRESH trace
    # of the same program hitting the now-warm compilation caches — the
    # re-run UX cost under utils.enable_compilation_cache().
    t0 = time.perf_counter()
    chain.lower(wss, xs, 0.0).compile()
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.jit(chain_fn).lower(wss, xs, 0.0).compile()
    warm_cache_s = time.perf_counter() - t0

    (ws, xs), (sts, _) = chain(wss, xs, 0.0)  # cold solves
    jax.block_until_ready(ws)
    (ws, xs), (sts, _) = chain(ws, xs, span)  # enter warmstarted regime
    jax.block_until_ready(ws)

    best_dt = np.inf
    all_sts, all_its = [], []
    # best-of-5: the tunneled device occasionally delivers a 20x-slow run
    # (host-side interference); best-of keeps the metric a device number
    for rep in range(5):
        t0 = time.perf_counter()
        (ws, xs), (sts, its) = chain(ws, xs, (2 + rep) * span)
        # host-transfer barrier (tiny slice): jax.block_until_ready has been
        # observed returning early on some axon programs; an actual device ->
        # host read cannot complete before the computation does
        _ = np.asarray(sts[-1])
        best_dt = min(best_dt, (time.perf_counter() - t0) / NSCAN_)
        all_sts.append(np.asarray(sts))
        all_its.append(np.asarray(its))

    st = np.concatenate(all_sts, axis=0)  # (5*NSCAN, B) statuses of EVERY solve
    its = np.concatenate(all_its, axis=0)  # (5*NSCAN, B) per-solve ADMM iters
    optimal_pct = float(np.mean(st == 0) * 100.0)
    value = B / best_dt
    if optimal_pct < 99.9:
        # convergence gate: a throughput number for unsolved QPs is not a
        # solves/sec number (VERDICT r1 weak #2)
        value = 0.0

    # Nominal-FLOP / MFU accounting (utils/flops.py): per solve, the ADMM
    # iterations + stopping checks of the (n, m) QP (factorizations are
    # hoisted by reuse_factors) plus, for the condensed variant, the
    # vectors-only transcription and state-recovery GEMMs.  A LOWER bound
    # on useful work: scaling/clip/finalize elementwise ops are unmodeled,
    # and lane/tile padding waste shows up as LOW utilization by
    # construction (nominal flops, not executed flops).
    from smooth_feedback_tpu.utils import (
        condensed_mpc_transcribe_flops,
        mfu_pct,
        qp_solve_flops,
    )

    nq, mq = ws0.primal.shape[-1], ws0.dual.shape[-1]
    mean_iters = float(np.mean(its))
    per_solve = qp_solve_flops(
        nq, mq, mean_iters,
        checks=mean_iters / 10.0,  # stop_check_iter=10 in this config
        factorizations=0.0,  # reuse_factors: hoisted out of the loop
    )
    if condense:
        nx = 2  # DI state dim; condensed xL = (N + 1) * nx with N = nq nodes
        per_solve += condensed_mpc_transcribe_flops(nq, mq, (nq + 1) * nx, nx)
    flops_per_step = per_solve * B
    device = jax.devices()[0].platform
    mfu = mfu_pct(flops_per_step, best_dt, device)

    return {
        "metric": f"di_mpc_k{K}_qp_solves_per_sec",
        "value": round(float(value), 1),
        "unit": "solves/sec",
        "vs_baseline": round(float(value) / 10000.0, 3),
        "optimal_pct": round(optimal_pct, 2),
        "batch": B,
        "variant": "condensed" if condense else "sparse",
        "step_ms": round(best_dt * 1e3, 3),
        "compile_s": round(compile_s, 1),
        "warm_cache_s": round(warm_cache_s, 1),
        "admm_iters_mean": round(mean_iters, 1),
        # nominal FLOPs of one fleet MPC step + model-FLOP utilization vs
        # the v5e bf16 peak (f32-highest matmuls cap nominal MFU at ~16.4%
        # of that peak — utils/flops.py) — null off-TPU
        "flops_per_step": float(f"{flops_per_step:.3e}"),
        "mfu_pct": None if mfu is None else float(f"{mfu:.3f}"),
        "device": device,
    }


def main():
    out = run_config(K, B)
    keep = {
        k: out[k]
        for k in (
            "metric", "value", "unit", "vs_baseline", "optimal_pct",
            "compile_s", "mfu_pct",
        )
    }
    print(json.dumps(keep))
    print(
        f"# batch={out['batch']} step={out['step_ms']:.2f}ms "
        f"optimal={out['optimal_pct']:.2f}% device={out['device']} "
        f"compile={out['compile_s']}s warm_cache={out['warm_cache_s']}s "
        f"mfu={out['mfu_pct']}%",
        file=sys.stderr,
    )


def sweep():
    """Run the full configured table and write benchmarks/BENCH_SWEEP.json
    (the artifact the README throughput table is generated from).  stdout
    still prints exactly the one K=50 headline line."""
    import os

    configs = [
        dict(K=50, B=8192, condense=True),
        dict(K=50, B=8192, condense=False),
        dict(K=50, B=2048, condense=True),
        dict(K=50, B=1024, condense=True),
        dict(K=100, B=4096, condense=True),
        dict(K=100, B=4096, condense=False),
        dict(K=200, B=2048, condense=True),
        dict(K=200, B=2048, condense=False),
    ]
    rows = []
    for cfg in configs:
        row = run_config(**cfg)
        rows.append(row)
        print(f"# {json.dumps(row)}", file=sys.stderr)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "benchmarks", "BENCH_SWEEP.json")
    with open(path, "w") as fh:
        json.dump(rows, fh, indent=1)
    head = rows[0]
    keep = {
        k: head[k]
        for k in (
            "metric", "value", "unit", "vs_baseline", "optimal_pct",
            "compile_s", "mfu_pct",
        )
    }
    print(json.dumps(keep))


def _preflight(timeout_s: float = 180.0) -> bool:
    """Probe device availability in a SUBPROCESS before committing to the
    real run: a wedged axon tunnel hangs ``jax.devices()`` indefinitely and
    ignores SIGTERM (observed fault mode), which would otherwise turn a dead
    device into a silent multi-hour hang instead of an honest failure line.
    A healthy tunnel answers in seconds; the generous budget absorbs slow
    cold starts."""
    import subprocess

    probe = "import jax; print(jax.devices()[0].platform)"
    try:
        out = subprocess.run(
            [sys.executable, "-c", probe],
            timeout=timeout_s,
            capture_output=True,
            text=True,
        )
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


if __name__ == "__main__":
    SWEEP = "--sweep" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if len(args) > 0:
        K = int(args[0])
    if len(args) > 1:
        B = int(args[1])
    from smooth_feedback_tpu.utils import enable_compilation_cache

    enable_compilation_cache()  # timing warms up separately; this cuts cold-start
    if not _preflight():
        print(
            json.dumps(
                {
                    "metric": f"di_mpc_k{K}_qp_solves_per_sec",
                    "value": 0.0,
                    "unit": "solves/sec",
                    "vs_baseline": 0.0,
                    "error": "device unavailable (jax.devices() probe timed out)",
                }
            )
        )
        sys.exit(1)
    sweep() if SWEEP else main()
