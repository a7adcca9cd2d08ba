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

from ..solvers.sqp import SQPParams, solve_nlp_sqp
from .collocation.functions import mesh_dyn_error
from .collocation.mesh import Mesh
from .nlp import NLPSolution, NLPSolutionStatus
from .ocp import OCP, OCPSolution
from .to_nlp import nlp_initial_guess, nlpsol_to_ocpsol, ocp_to_nlp, ocpsol_to_nlpsol


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


class SolveOCPInfo(NamedTuple):
    meshes: List[Mesh]
    nlp_iters: List[int]
    errors: List[float]
    status: NLPSolutionStatus


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
    meshes, iters, errors = [], [], []
    status = NLPSolutionStatus.IterationLimit
    ocpsol = None

    for it in range(params.max_refine_iter):
        nlp = ocp_to_nlp(flatocp, mesh)
        solve = jax.jit(lambda zz: solve_nlp_sqp(nlp, zz, params.sqp))
        nlpsol = solve(z)
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

        if max_err <= params.target_err:
            break

        mesh = mesh.refine_errors(
            [float(e) for e in errs], 0.1 * params.target_err
        )
        z = ocpsol_to_nlpsol(flatocp, mesh, ocpsol)

    return ocpsol, mesh, SolveOCPInfo(meshes, iters, errors, status)


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
