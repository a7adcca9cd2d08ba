"""Multi-chip (virtual 8-device CPU mesh) data-parallel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.parallel import dp_mesh, shard_batch, shard_pytree
from smooth_feedback_tpu.qp import QPSolverParams, random_qp, solve_qp_batch


@pytest.fixture
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    return dp_mesh()


def test_sharded_qp_batch_matches_single_device(mesh):
    """Sharding the QP batch across the mesh gives identical results."""
    B = 16
    keys = jax.random.split(jax.random.PRNGKey(3), B)
    qps = jax.vmap(lambda k: random_qp(k, n=6, m=8))(keys)
    prm = QPSolverParams()

    sol_local = solve_qp_batch(qps, prm)
    qps_sharded = shard_pytree(qps, mesh)
    sol_sharded = solve_qp_batch(qps_sharded, prm)

    np.testing.assert_allclose(sol_local.primal, sol_sharded.primal, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(sol_local.status), np.asarray(sol_sharded.status)
    )
    # outputs actually live distributed
    assert len(sol_sharded.primal.sharding.device_set) == len(jax.devices())


def test_graft_entry_single_chip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out.u)).all()


def test_graft_entry_multichip():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(len(jax.devices()))


def test_graft_entry_multichip_bare_process():
    """Replicates the driver's environment: a fresh process with NO conftest
    device setup (no XLA_FLAGS, no JAX_PLATFORMS). dryrun_multichip must
    self-provision the 8-device virtual CPU mesh (round-1 failure mode)."""
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")
    }
    # dryrun_multichip never initializes a backend in the outer process (it
    # only reads jax.config), so the single-tenant TPU stays untouched.
    res = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, f"stdout={res.stdout}\nstderr={res.stderr}"
    assert "dryrun_multichip OK: 8 devices" in res.stdout
