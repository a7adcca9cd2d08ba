"""High-level OCP solve with hp-adaptive mesh refinement.

The analog of the reference's refinement driver loop
(examples/ocp_se2_nlp.cpp:47-91): repeatedly transcribe the flat OCP on the
current mesh, solve the NLP (native SQP in place of Ipopt), estimate
per-interval dynamics errors on a degree-elevated mesh, and refine until the
target error is met.  Each mesh signature triggers one XLA compilation (the
fixed-shape analog of the reference's reallocation); solutions transfer
between meshes via `ocpsol_to_nlpsol` warmstarts.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..solvers.sqp import (
    SQPParams,
    rescue_nonoptimal,
    solve_nlp_sqp,
    solve_nlp_sqp_batch,
)
from .collocation.functions import mesh_dyn_error
from .collocation.mesh import Mesh
from .nlp import NLPSolution, NLPSolutionStatus
from .ocp import OCP, OCPSolution
from .to_nlp import (
    nlp_initial_guess,
    nlp_layout,
    nlpsol_to_ocpsol,
    ocp_to_nlp,
    ocpsol_to_nlpsol,
)


@dataclasses.dataclass(frozen=True)
class SolveOCPParams:
    target_err: float = 1e-6  # interval dynamics-error target
    max_refine_iter: int = 10
    tf_guess: float = 1.0  # initial horizon guess
    sqp: SQPParams = dataclasses.field(default_factory=SQPParams)
    verbose: bool = False
    # Stop refining when an NLP solve is non-Optimal instead of refining the
    # mesh around an unconverged solution (reference examples log-and-stop,
    # examples/ocp_se2_nlp.cpp:47-91).
    fail_fast: bool = True
    # Fleet driver only: before fail_fast triggers, re-solve non-Optimal
    # members solo with boosted budgets (solvers.sqp.rescue_nonoptimal) —
    # the lockstep fleet gives everyone the same budget, so the rare member
    # that exhausts it gets the reference's keep-iterating treatment
    # (examples/ocp_se2_nlp.cpp:47-91) instead of abandoning the tail.
    rescue: bool = True


class SolveOCPInfo(NamedTuple):
    meshes: List[Mesh]
    nlp_iters: List[int]
    errors: List[float]
    status: NLPSolutionStatus


class _SolveCache:
    """Memo of jitted SQP solves keyed on (problem, mesh signature, params).

    ``jax.jit`` caches by function identity, but a fresh
    ``jax.jit(lambda z: ...)`` per refinement pass defeats that: a loop (or a
    sweep of problems) revisiting a mesh signature would re-trace and
    re-compile from scratch.  Callables are keyed by ``id`` and guarded by
    strong references held in the cache (so a recycled id can never alias a
    collected function); bound arrays are keyed by value.  FIFO-bounded."""

    def __init__(self, maxsize: int = 32):
        self._entries = {}  # key -> (flatocp_ref, jitted)
        self._maxsize = maxsize

    @staticmethod
    def _funs(flatocp):
        return (flatocp.theta, flatocp.f, flatocp.g, flatocp.cr, flatocp.ce)

    @staticmethod
    def _key(flatocp, mesh, sqp):
        import numpy as _np

        bounds = tuple(
            tuple(_np.asarray(b).ravel().tolist())
            for b in (flatocp.crl, flatocp.cru, flatocp.cel, flatocp.ceu)
        )
        return (
            tuple(id(f) for f in _SolveCache._funs(flatocp)),
            bounds,
            flatocp.X,
            flatocp.U,
            mesh,
            sqp,
        )

    def get(self, flatocp, mesh, sqp):
        key = self._key(flatocp, mesh, sqp)
        hit = self._entries.get(key)
        if hit is not None:
            held, jitted = hit
            if all(a is b for a, b in zip(self._funs(held), self._funs(flatocp))):
                return jitted
        nlp = ocp_to_nlp(flatocp, mesh)
        jitted = jax.jit(lambda zz, ll: solve_nlp_sqp(nlp, zz, sqp, lam0=ll))
        if len(self._entries) >= self._maxsize:
            self._entries.pop(next(iter(self._entries)))
        self._entries[key] = (flatocp, jitted)
        return jitted


_solve_cache = _SolveCache()


def solve_ocp_flat(
    flatocp: OCP,
    mesh: Optional[Mesh] = None,
    params: SolveOCPParams = SolveOCPParams(),
):
    """Solve a FLAT (Euclidean) OCP with mesh refinement.

    Returns ``(ocpsol, mesh, info)``.  For Lie-group problems flatten first
    (``flatten_ocp``) and unflatten the result (``unflatten_ocpsol``).
    """
    if mesh is None:
        mesh = Mesh()

    z = nlp_initial_guess(flatocp, mesh, params.tf_guess)
    lam = jnp.zeros((nlp_layout(flatocp, mesh).m,), z.dtype)
    meshes, iters, errors = [], [], []
    status = NLPSolutionStatus.IterationLimit
    ocpsol = None

    for it in range(params.max_refine_iter):
        # memoized: one trace/compile per (problem, mesh signature, params) —
        # refinement loops and same-mesh sweeps reuse the compiled solve
        solve = _solve_cache.get(flatocp, mesh, params.sqp)
        nlpsol = solve(z, lam)
        status = NLPSolutionStatus(int(nlpsol.status))
        ocpsol = nlpsol_to_ocpsol(flatocp, mesh, nlpsol)

        if status != NLPSolutionStatus.Optimal and params.fail_fast:
            # don't refine the mesh around an unconverged solution; surface
            # the non-Optimal status to the caller instead
            meshes.append(mesh)
            iters.append(int(nlpsol.iters))
            errors.append(float("nan"))
            if params.verbose:
                print(f"[solve_ocp] iter {it}: NLP returned {status.name}; stopping")
            break

        # error estimation on a degree-elevated mesh (ocp_se2_nlp.cpp:79-81)
        mesh_hi = mesh.increase_degrees()
        errs = mesh_dyn_error(
            mesh_hi, flatocp.f, 0.0, ocpsol.tf, ocpsol.x, ocpsol.u
        )
        max_err = float(jnp.max(errs))

        meshes.append(mesh)
        iters.append(int(nlpsol.iters))
        errors.append(max_err)
        if params.verbose:
            print(
                f"[solve_ocp] iter {it}: mesh {mesh.N_ivals} ivals / "
                f"{mesh.N_colloc} pts, nlp iters {int(nlpsol.iters)}, "
                f"max dyn err {max_err:.2e}"
            )

        # never refine on the final pass: the refined mesh would never be
        # solved, and the returned mesh must be the one the returned
        # solution was solved on
        if max_err <= params.target_err or it == params.max_refine_iter - 1:
            break

        mesh = mesh.refine_errors(
            [float(e) for e in errs], 0.1 * params.target_err
        )
        # full warmstart transfer: primal AND constraint multipliers
        # (ocp_to_nlp.hpp:515-554 + test_ocp_ipopt.cpp:129)
        z, lam = ocpsol_to_nlpsol(flatocp, mesh, ocpsol, multipliers=True)

    return ocpsol, mesh, SolveOCPInfo(meshes, iters, errors, status)


class SolveOCPBatchInfo(NamedTuple):
    meshes: List[Mesh]
    nlp_iters: List[jax.Array]  # per refinement pass: (B,) SQP iterations
    errors: List[float]  # per pass: max dynamics error across the fleet
    statuses: jax.Array  # (B,) final NLPSolutionStatus values
    rescued: List[int] = []  # per pass: members re-solved solo (rescue=True)


class _BatchSolveCache:
    """Memo of the jitted fleet solve / error / transfer programs keyed on
    (family identity, mesh signature(s), params); same rationale as
    :class:`_SolveCache` — a sweep revisiting a mesh signature must not
    re-trace.  Strong references to the family callable guard id reuse."""

    def __init__(self, maxsize: int = 32):
        self._entries = {}
        self._maxsize = maxsize

    def get(self, kind, make_flat, key, build):
        full_key = (kind, id(make_flat)) + key
        hit = self._entries.get(full_key)
        if hit is not None and hit[0] is make_flat:
            return hit[1]
        fn = build()
        if len(self._entries) >= self._maxsize:
            self._entries.pop(next(iter(self._entries)))
        self._entries[full_key] = (make_flat, fn)
        return fn


_batch_solve_cache = _BatchSolveCache()


def solve_ocp_flat_batch(
    make_flat: Callable,
    thetas,
    mesh: Optional[Mesh] = None,
    params: SolveOCPParams = SolveOCPParams(),
):
    """Solve a FLEET of flat OCPs on a SHARED hp-refined mesh.

    ``make_flat(theta) -> OCP`` must be jax-traceable in ``theta`` (problem
    data with a leading batch axis on every leaf); all members share the
    problem structure.  The fleet solves as ONE natively batched SQP
    (:func:`solve_nlp_sqp_batch` — not vmap, see its docstring), and the
    mesh refines on the PER-INTERVAL MAXIMUM dynamics error across the
    fleet, so every member shares one compiled program per mesh signature
    (the TPU-idiomatic analog of the reference's per-problem refinement
    loop, examples/ocp_se2_nlp.cpp:47-91).

    Returns ``(nlpsol, mesh, info)`` where ``nlpsol`` carries a leading
    batch axis; reconstruct per-member trajectories with
    ``nlpsol_to_ocpsol(make_flat(theta_i), mesh, jax.tree.map(lambda a:
    a[i], nlpsol))``.

    Compiled programs are memoized per (family, bounds values, mesh
    signature, params).  ``make_flat`` must be PURE in ``theta``: problem
    data that changes between calls has to flow through ``theta`` (a traced
    argument) — data captured in the closure bakes into the compiled trace.
    Bound arrays are the exception (keyed by value, like the single-problem
    driver's cache), so changing bounds between calls is safe.
    """
    if mesh is None:
        mesh = Mesh()

    th0 = jax.tree.map(lambda a: a[0], thetas)
    B = jax.tree.leaves(thetas)[0].shape[0]
    flat0 = make_flat(th0)
    z1 = nlp_initial_guess(flat0, mesh, params.tf_guess)
    z = jnp.broadcast_to(z1, (B,) + z1.shape)
    lam = jnp.zeros((B, nlp_layout(flat0, mesh).m), z1.dtype)

    # Cache-key component capturing make_flat's closure DATA by value (the
    # bounds, like _SolveCache): problem data must flow through ``theta``
    # (an argument of the compiled programs), but bounds captured in the
    # closure bake into the trace — keying them by value prevents a rebound
    # closure from silently reusing a stale compile.
    import numpy as _np

    fam_key = (
        tuple(
            tuple(_np.asarray(b).ravel().tolist())
            for b in (flat0.crl, flat0.cru, flat0.cel, flat0.ceu)
        ),
        flat0.X,
        flat0.U,
    )

    meshes, iters, errors, rescued = [], [], [], []
    statuses = jnp.full((B,), int(NLPSolutionStatus.IterationLimit), jnp.int32)
    nlpsol = None
    # straggler sort key for chunked fleets (params.sqp.chunk_size): pass
    # k's per-member inner-ADMM totals order pass k+1's members so hard
    # members cluster into few chunks (zeros on pass 0 = identity order)
    sortk = jnp.zeros((B,), jnp.int32)

    for it in range(params.max_refine_iter):

        def _build_solve(mesh=mesh):
            def solve(th, zz, ll, sk):
                return solve_nlp_sqp_batch(
                    lambda t: ocp_to_nlp(make_flat(t), mesh),
                    th,
                    zz,
                    params.sqp,
                    lam0=ll,
                    sort_key=sk,
                )

            return jax.jit(solve)

        solve = _batch_solve_cache.get(
            "solve", make_flat, fam_key + (mesh, params.sqp), _build_solve
        )
        nlpsol = solve(thetas, z, lam, sortk)
        statuses = nlpsol.status
        all_opt = bool((statuses == int(NLPSolutionStatus.Optimal)).all())
        n_rescued = 0

        if not all_opt and params.rescue:
            make_nlp = _batch_solve_cache.get(
                "mknlp",
                make_flat,
                fam_key + (mesh,),
                lambda: lambda t: ocp_to_nlp(make_flat(t), mesh),
            )
            nlpsol, n_rescued = rescue_nonoptimal(
                make_nlp, thetas, nlpsol, params.sqp
            )
            statuses = nlpsol.status
            all_opt = bool((statuses == int(NLPSolutionStatus.Optimal)).all())
            if params.verbose and n_rescued:
                print(
                    f"[solve_ocp_batch] iter {it}: rescued {n_rescued} "
                    f"members ({int((statuses != 0).sum())} still bad)"
                )
        rescued.append(n_rescued)
        sortk = nlpsol.qp_iters

        if not all_opt and params.fail_fast:
            meshes.append(mesh)
            iters.append(nlpsol.iters)
            errors.append(float("nan"))
            if params.verbose:
                n_bad = int((statuses != 0).sum())
                print(
                    f"[solve_ocp_batch] iter {it}: {n_bad}/{B} non-Optimal; "
                    "stopping"
                )
            break

        mesh_hi = mesh.increase_degrees()

        def _build_err(mesh=mesh, mesh_hi=mesh_hi):
            def one(th, s):
                flat = make_flat(th)
                o = nlpsol_to_ocpsol(flat, mesh, s)
                return mesh_dyn_error(mesh_hi, flat.f, 0.0, o.tf, o.x, o.u)

            return jax.jit(jax.vmap(one))

        err_fn = _batch_solve_cache.get(
            "err", make_flat, fam_key + (mesh, mesh_hi), _build_err
        )
        errs_b = err_fn(thetas, nlpsol)  # (B, n_ivals)
        errs = jnp.max(errs_b, axis=0)  # fleet-max per interval
        max_err = float(jnp.max(errs))

        meshes.append(mesh)
        iters.append(nlpsol.iters)
        errors.append(max_err)
        if params.verbose:
            print(
                f"[solve_ocp_batch] iter {it}: mesh {mesh.N_ivals} ivals / "
                f"{mesh.N_colloc} pts, max dyn err {max_err:.2e}"
            )

        # never refine on the final pass (same rationale as solve_ocp_flat:
        # the returned mesh must be the one nlpsol was solved on — the
        # docstring reconstruction recipe reshapes nlpsol.x by mesh layout)
        if max_err <= params.target_err or it == params.max_refine_iter - 1:
            break

        mesh_new = mesh.refine_errors(
            [float(e) for e in errs], 0.1 * params.target_err
        )

        def _build_xfer(mesh=mesh, mesh_new=mesh_new):
            def one(th, s):
                flat = make_flat(th)
                # full warmstart transfer: primal AND constraint multipliers
                return ocpsol_to_nlpsol(
                    flat, mesh_new, nlpsol_to_ocpsol(flat, mesh, s),
                    multipliers=True,
                )

            return jax.jit(jax.vmap(one))

        transfer = _batch_solve_cache.get(
            "xfer", make_flat, fam_key + (mesh, mesh_new), _build_xfer
        )
        z, lam = transfer(thetas, nlpsol)
        mesh = mesh_new

    return nlpsol, mesh, SolveOCPBatchInfo(
        meshes, iters, errors, statuses, rescued
    )


def solve_ocp(
    ocp: OCP,
    xl_fun: Callable,
    ul_fun: Callable,
    mesh: Optional[Mesh] = None,
    params: SolveOCPParams = SolveOCPParams(),
):
    """Solve a Lie-group OCP end to end: flatten around the nominal
    trajectories, solve with mesh refinement, unflatten the solution.

    The one-call analog of the reference's full pipeline
    (examples/ocp_se2_nlp.cpp:31-91).  Returns ``(ocpsol, mesh, info)`` with
    ``ocpsol.x(t)``/``ocpsol.u(t)`` on the original group.
    """
    from .flatten import flatten_ocp, unflatten_ocpsol

    flat = flatten_ocp(ocp, xl_fun, ul_fun)
    flatsol, mesh, info = solve_ocp_flat(flat, mesh, params)
    return unflatten_ocpsol(flatsol, ocp, xl_fun, ul_fun), mesh, info
