"""Data-parallel sharding of problem batches over a device mesh.

The reference is single-threaded C++ (SURVEY section 2: no parallelism of any
kind); the TPU-native scaling model is pure data parallelism over independent
problem instances (QPs, filters, MPC steps): a 1-D mesh, batch axis sharded
across chips, no inter-problem communication.  The only collectives are the
all-reduce XLA inserts for the solver's global stopping predicate
``any(status == RUNNING)`` and for summary statistics — both ride ICI.

Use :func:`dp_mesh` + :func:`shard_batch` and call the ordinary batched APIs
(``solve_qp_batch``, ``step.fleet``): jit propagates the shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def dp_mesh(devices: Optional[Sequence] = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(array, mesh: Mesh, axis_name: str = "dp"):
    """Shard the leading (batch) axis of one array across the mesh."""
    spec = P(axis_name, *([None] * (array.ndim - 1)))
    return jax.device_put(array, NamedSharding(mesh, spec))


def shard_trailing(array, mesh: Mesh, axis_name: str = "dp"):
    """Shard the TRAILING axis of one array across the mesh (the batch axis
    of lane-major fleet layouts, e.g. ``EKFFleetState.Pt``)."""
    spec = P(*([None] * (array.ndim - 1)), axis_name)
    return jax.device_put(array, NamedSharding(mesh, spec))


def shard_ekf_fleet(fleet, mesh: Mesh, axis_name: str = "dp"):
    """Shard a fleet filter state across the mesh: ``g`` on its leading
    (batch) axis, the covariance/factor stack on its trailing (lane/batch)
    axis.  Works for both ``EKFFleetState`` (field ``Pt``) and
    ``SqrtEKFFleetState`` (field ``St``)."""
    g_field, stack_field = fleet._fields
    return type(fleet)(**{
        g_field: shard_batch(getattr(fleet, g_field), mesh, axis_name),
        stack_field: shard_trailing(getattr(fleet, stack_field), mesh, axis_name),
    })


def shard_pytree(tree, mesh: Mesh, axis_name: str = "dp"):
    """Shard the leading axis of every leaf of a pytree (QuadraticProgram,
    QPSolution warmstarts, EKFState fleets, ...)."""
    return jax.tree.map(lambda a: shard_batch(a, mesh, axis_name), tree)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree across the mesh (for shared parameters)."""
    return jax.tree.map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), tree
    )


def make_sharded_fleet_step(fleet_fn, mesh: Mesh, axis_name: str = "dp"):
    """shard_map a fleet MPC step over the batch axis of a device mesh.

    ``fleet_fn`` is ``step.fleet_shared_t`` (or ``step.fleet``) from
    :func:`controllers.make_mpc_step`; the returned function has the same
    ``(warmstarts, t, xs) -> MPCStepResult`` signature with ``warmstarts``/
    ``xs`` sharded on their leading axis and ``t`` replicated (scalar clock
    or per-member times alike — ``step.fleet`` broadcasts internally).

    Explicit ``shard_map`` — rather than relying on jit sharding propagation
    — is what makes the *Pallas* backend partition: ``pallas_call`` has no
    SPMD partitioning rules, so under plain jit a sharded batch would be
    gathered onto one device; under shard_map every device runs the fused
    kernel on its local block (pure data parallelism, no collectives).
    """
    dp = P(axis_name)
    dp_tree = lambda tree: jax.tree.map(lambda _: dp, tree)

    def sharded(warmstarts, t, xs):
        # a scalar clock replicates; a per-member (B,) time vector shards
        # along the batch axis like the states
        t_spec = dp if np.ndim(t) >= 1 else P()
        in_specs = (dp_tree(warmstarts), t_spec, dp)
        # result leaves are all batch-leading (u, status, warmstart, trajs)
        out_shape = jax.eval_shape(fleet_fn, warmstarts, t, xs)
        out_specs = dp_tree(out_shape)
        return jax.shard_map(
            fleet_fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )(warmstarts, t, xs)

    return sharded


def make_sharded_sqp_fleet(make_nlp, mesh: Mesh, params, axis_name: str = "dp"):
    """shard_map a batched SQP fleet (``solve_nlp_sqp_batch``) over the mesh.

    Each device runs the complete lockstep SQP + inner-ADMM loop on its
    LOCAL sub-batch with NO collectives: the per-device ``lax.while_loop``
    conditions are local, so every chip's early exits are decoupled from the
    other chips' stragglers.  Sharding a B-member fleet over n chips is
    therefore also the distributed half of the fleet-size-knee fix
    (docs/TUNING.md): each chip pays only the worst member of B/n, and
    ``params.chunk_size`` composes per chip for on-chip chunking.

    ``make_nlp(theta) -> NLP`` as in :func:`solve_nlp_sqp_batch`; the
    returned ``sharded(thetas, x0, lam0=None)`` takes batch-leading inputs
    (shard them with :func:`shard_pytree` / :func:`shard_batch`) and returns
    a batch-leading, batch-sharded ``NLPSolution``.  B must divide evenly by
    the mesh size (shard_map requirement).
    """
    from ..solvers.sqp import solve_nlp_sqp_batch

    dp = P(axis_name)
    dp_tree = lambda tree: jax.tree.map(lambda _: dp, tree)

    def local(th, x0, lam0):
        return solve_nlp_sqp_batch(make_nlp, th, x0, params, lam0=lam0)

    def sharded(thetas, x0, lam0=None):
        if lam0 is None:
            import jax.numpy as jnp

            m = make_nlp(jax.tree.map(lambda a: a[0], thetas)).m
            lam0 = jnp.zeros((x0.shape[0], m), x0.dtype)
        in_specs = (dp_tree(thetas), dp, dp)
        out_shape = jax.eval_shape(local, thetas, x0, lam0)
        return jax.shard_map(
            local, mesh=mesh, in_specs=in_specs,
            out_specs=dp_tree(out_shape), check_vma=False,
        )(thetas, x0, lam0)

    return sharded
