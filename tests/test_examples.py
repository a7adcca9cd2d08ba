"""Execute every example end-to-end with tiny shapes (the reference CI
builds all examples with -Werror AND runs them, build_and_test.yml:55;
examples print trajectories when plotting is disabled).  Each example's
``main`` takes size parameters so the smoke runs stay cheap; the full-size
runs are covered by benchmarks/.
"""

import importlib.util
import pathlib

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).parent.parent / "examples"
EXAMPLES = sorted(EXAMPLES_DIR.glob("*.py"))

# tiny-shape arguments per example (default-size mains are the benchmarks' job)
SMOKE_KWARGS = {
    "asif_doubleintegrator": dict(steps=40),
    "ekf_fleet_se2": dict(steps=40, B=8),
    "ekf_se2_localization": dict(steps=40),
    "mpc_asif_vehicle": dict(steps=3, K_mpc=8, K_asif=10),
    "mpc_doubleintegrator": dict(steps=30),
    "mpc_se3_rigidbody": dict(steps=40),
    "ocp_doubleintegrator_nlp": dict(target_err=1e-2, max_refine_iter=1),
    "ocp_doubleintegrator_qp": dict(n_ival=3),
    "ocp_se2_nlp": dict(target_err=1e-2, max_refine_iter=1),
    "ocp_se3_nlp": dict(target_err=1e-2, max_refine_iter=1, B=2),
    "ocp_se2_qp": dict(n_ival=2),
    "output_feedback_vehicle": dict(steps=60, K_mpc=8, K_asif=10),
    "pid_se2": dict(steps=60),
}


def _load(path):
    spec = importlib.util.spec_from_file_location(f"example_{path.stem}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # __name__ != "__main__": main() not run yet
    return mod


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_runs(path):
    mod = _load(path)
    assert hasattr(mod, "main"), f"{path.name} has no main()"
    kwargs = SMOKE_KWARGS.get(path.stem)
    assert kwargs is not None, (
        f"{path.name}: add tiny-shape smoke kwargs to SMOKE_KWARGS"
    )
    mod.main(**kwargs)
