"""Mock-backed tests of the optional solver bridges.

``osqp`` and ``cyipopt`` are not installed in this image, so the bridges'
parameter mapping and status translation (the logic the reference implements
in compat/osqp.hpp:51-81,108-139 and compat/ipopt.hpp:246-338) are exercised
against in-memory fake modules injected into ``sys.modules``.
"""

import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.ocp.nlp import NLP, NLPSolutionStatus
from smooth_feedback_tpu.qp.types import (
    QPSolution,
    QPSolutionStatus,
    QPSolverParams,
    QuadraticProgram,
)

# --------------------------------------------------------------------- osqp


class _FakeOSQPResult:
    def __init__(self, status):
        self.x = np.array([1.0, 2.0])
        self.y = np.array([0.5])
        self.info = types.SimpleNamespace(
            status=status, iter=13, obj_val=-1.25, pri_res=1e-7, dua_res=2e-7
        )


class _FakeOSQP:
    """Records setup/warm_start kwargs; returns a canned result."""

    instances = []

    def __init__(self):
        self.setup_kwargs = None
        self.warmstart_args = None
        self.status = "solved"
        _FakeOSQP.instances.append(self)

    def setup(self, **kwargs):
        self.setup_kwargs = kwargs

    def warm_start(self, x=None, y=None):
        self.warmstart_args = (np.asarray(x), np.asarray(y))

    def solve(self):
        return _FakeOSQPResult(self.status)


@pytest.fixture
def fake_osqp(monkeypatch):
    mod = types.ModuleType("osqp")
    mod.OSQP = _FakeOSQP
    _FakeOSQP.instances = []
    monkeypatch.setitem(sys.modules, "osqp", mod)
    return mod


def _small_qp():
    return QuadraticProgram(
        P=jnp.asarray([[2.0, 0.5], [0.5, 1.0]]),
        q=jnp.asarray([1.0, -1.0]),
        A=jnp.asarray([[1.0, 1.0]]),
        l=jnp.asarray([-1.0]),
        u=jnp.asarray([1.0]),
    )


def test_osqp_bridge_param_mapping(fake_osqp):
    from smooth_feedback_tpu.compat.osqp_bridge import osqp_available, solve_qp_osqp

    assert osqp_available()
    prm = QPSolverParams(
        alpha=1.55, rho=0.2, sigma=2e-6, scaling=True,
        eps_abs=1e-5, eps_rel=1e-6, eps_primal_inf=1e-7, eps_dual_inf=1e-8,
        max_iter=321, stop_check_iter=10, polish=True, polish_iter=7,
        delta=3e-6,
    )
    sol = solve_qp_osqp(_small_qp(), prm)

    kw = _FakeOSQP.instances[-1].setup_kwargs
    # reference mapping, compat/osqp.hpp:51-81
    assert kw["alpha"] == 1.55 and kw["rho"] == 0.2 and kw["sigma"] == 2e-6
    assert kw["scaling"] == 10  # scaling=True -> 10 Ruiz iters
    assert kw["eps_abs"] == 1e-5 and kw["eps_rel"] == 1e-6
    assert kw["eps_prim_inf"] == 1e-7 and kw["eps_dual_inf"] == 1e-8
    assert kw["max_iter"] == 321 and kw["check_termination"] == 10
    assert kw["polish"] is True and kw["polish_refine_iter"] == 7
    assert kw["delta"] == 3e-6
    assert kw["adaptive_rho"] is False and kw["scaled_termination"] is False
    # P passed as upper triangle (OSQP convention)
    P_dense = np.asarray(kw["P"].todense())
    np.testing.assert_allclose(P_dense, np.triu([[2.0, 0.5], [0.5, 1.0]]))

    assert int(sol.status) == QPSolutionStatus.Optimal
    assert int(sol.iters) == 13
    np.testing.assert_allclose(sol.primal, [1.0, 2.0])


def test_osqp_bridge_scaling_off(fake_osqp):
    from smooth_feedback_tpu.compat.osqp_bridge import solve_qp_osqp

    solve_qp_osqp(_small_qp(), QPSolverParams(scaling=False))
    assert _FakeOSQP.instances[-1].setup_kwargs["scaling"] == 0


def test_osqp_bridge_warmstart_passthrough(fake_osqp):
    from smooth_feedback_tpu.compat.osqp_bridge import solve_qp_osqp

    ws = QPSolution(
        primal=jnp.asarray([0.1, 0.2]),
        dual=jnp.asarray([0.3]),
        status=jnp.int32(0), iters=jnp.int32(0),
        objective=jnp.float64(0.0),
        primal_res=jnp.float64(0.0), dual_res=jnp.float64(0.0),
    )
    solve_qp_osqp(_small_qp(), QPSolverParams(), warmstart=ws)
    wx, wy = _FakeOSQP.instances[-1].warmstart_args
    np.testing.assert_allclose(wx, [0.1, 0.2])
    np.testing.assert_allclose(wy, [0.3])


@pytest.mark.parametrize(
    "osqp_status,expected",
    [
        ("solved", QPSolutionStatus.Optimal),
        ("solved inaccurate", QPSolutionStatus.Optimal),
        ("primal infeasible", QPSolutionStatus.PrimalInfeasible),
        ("dual infeasible", QPSolutionStatus.DualInfeasible),
        ("maximum iterations reached", QPSolutionStatus.MaxIterations),
        ("run time limit reached", QPSolutionStatus.MaxTime),
        ("interrupted", QPSolutionStatus.Unknown),
    ],
)
def test_osqp_bridge_status_map(fake_osqp, osqp_status, expected):
    from smooth_feedback_tpu.compat.osqp_bridge import solve_qp_osqp

    orig_init = _FakeOSQP.__init__

    def patched(self):
        orig_init(self)
        self.status = osqp_status

    _FakeOSQP.__init__ = patched
    try:
        sol = solve_qp_osqp(_small_qp(), QPSolverParams())
    finally:
        _FakeOSQP.__init__ = orig_init
    assert int(sol.status) == expected


# ------------------------------------------------------------------- cyipopt


class _FakeIpoptProblem:
    """Records construction args/options; drives the jax callbacks once."""

    last = None

    def __init__(self, n, m, problem_obj, lb, ub, cl, cu):
        self.n, self.m = n, m
        self.obj = problem_obj
        self.lb, self.ub, self.cl, self.cu = (
            np.asarray(lb), np.asarray(ub), np.asarray(cl), np.asarray(cu)
        )
        self.options = {}
        self.ipopt_status = 0
        _FakeIpoptProblem.last = self

    def add_option(self, k, v):
        self.options[k] = v

    def solve(self, x0, lagrange=[], zl=[], zu=[]):
        x0 = np.asarray(x0)
        self.warmstart_seen = (
            (np.asarray(lagrange), np.asarray(zl), np.asarray(zu))
            if len(lagrange)
            else None
        )
        # exercise every jax-backed callback the way Ipopt would
        fv = self.obj.objective(x0)
        gv = self.obj.gradient(x0)
        cv = self.obj.constraints(x0)
        jv = self.obj.jacobian(x0)
        assert np.isscalar(fv) or np.ndim(fv) == 0
        assert gv.shape == (self.n,)
        assert cv.shape == (self.m,)
        assert jv.shape == (self.m * self.n,)
        # drive the intermediate (per-iteration) callback like Ipopt does
        if hasattr(self.obj, "intermediate"):
            for it in range(6):
                assert (
                    self.obj.intermediate(
                        0, it, float(fv), 0.1, 0.1, 0.1, 0.1, 0.1, 1.0, 1.0, 1
                    )
                    is True
                )
        # exact-Hessian mode: drive eval_h the way Ipopt would
        self.hessian_seen = None
        if hasattr(self.obj, "hessian"):
            rows, cols = self.obj.hessianstructure()
            assert np.all(rows >= cols)  # lower triangle
            hv = self.obj.hessian(x0, np.full(self.m, 3.0), 0.5)
            assert hv.shape == rows.shape
            self.hessian_seen = (rows, cols, hv)
        info = {
            "status": self.ipopt_status,
            "obj_val": float(fv),
            "mult_x_L": np.zeros(self.n),
            "mult_x_U": np.zeros(self.n),
            "mult_g": np.full(self.m, 2.0),
        }
        return x0, info


@pytest.fixture
def fake_cyipopt(monkeypatch):
    mod = types.ModuleType("cyipopt")
    mod.Problem = _FakeIpoptProblem
    monkeypatch.setitem(sys.modules, "cyipopt", mod)
    return mod


def _small_nlp():
    # min (x0-1)^2 + x1^2  s.t. 0 <= x0 + x1 <= 1, -inf/inf var bounds
    return NLP(
        n=2, m=1,
        f=lambda x: (x[0] - 1.0) ** 2 + x[1] ** 2,
        g=lambda x: jnp.asarray([x[0] + x[1]]),
        xl=jnp.asarray([-jnp.inf, -5.0]),
        xu=jnp.asarray([jnp.inf, 5.0]),
        gl=jnp.asarray([0.0]),
        gu=jnp.asarray([1.0]),
    )


def test_ipopt_bridge_mapping(fake_cyipopt):
    from smooth_feedback_tpu.compat.ipopt_bridge import ipopt_available, solve_nlp_ipopt

    assert ipopt_available()
    sol = solve_nlp_ipopt(_small_nlp(), np.array([0.5, 0.5]), {"max_iter": 77})

    p = _FakeIpoptProblem.last
    # +-2e19 bound clipping (compat/ipopt.hpp:84-87)
    np.testing.assert_allclose(p.lb, [-2e19, -5.0])
    np.testing.assert_allclose(p.ub, [2e19, 5.0])
    # default L-BFGS Hessian + option passthrough (ocp_se2_nlp.cpp:60-66)
    assert p.options["hessian_approximation"] == "limited-memory"
    assert p.options["max_iter"] == 77

    assert int(sol.status) == NLPSolutionStatus.Optimal
    # lambda sign flip: lam = -mult_g (Ipopt convention differs)
    np.testing.assert_allclose(sol.lam, [-2.0])
    np.testing.assert_allclose(sol.objective, 0.5)  # f at x0=(0.5,0.5)
    # iteration count extracted through the intermediate callback (the
    # fake drives 6 iterations, 0..5)
    assert int(sol.iters) == 5


def test_ipopt_bridge_warmstart_passthrough(fake_cyipopt):
    """NLPSolution warmstart -> Ipopt get_starting_point analog (reference
    compat/ipopt.hpp:95-116): primal overrides x0, multipliers pass through
    with the mult_g sign flip, and warm_start_init_point is set."""
    import jax.numpy as jnp

    from smooth_feedback_tpu.compat.ipopt_bridge import solve_nlp_ipopt
    from smooth_feedback_tpu.nlp import NLPSolution

    ws = NLPSolution(
        status=np.int32(0), iters=np.int32(4),
        x=jnp.asarray([0.25, 0.75]),
        zl=jnp.asarray([0.1, 0.0]), zu=jnp.asarray([0.0, 0.2]),
        lam=jnp.asarray([1.5]),
        objective=np.float64(0.0), kkt_res=np.float64(0.0),
    )
    sol = solve_nlp_ipopt(_small_nlp(), np.zeros(2), warmstart=ws)
    p = _FakeIpoptProblem.last
    assert p.options["warm_start_init_point"] == "yes"
    lag, zl, zu = p.warmstart_seen
    np.testing.assert_allclose(lag, [-1.5])  # lam -> mult_g sign flip
    np.testing.assert_allclose(zl, [0.1, 0.0])
    np.testing.assert_allclose(zu, [0.0, 0.2])
    # the fake echoes its x0 back: proves warmstart.x overrode the x0 arg
    np.testing.assert_allclose(sol.x, [0.25, 0.75])
    assert int(sol.status) == NLPSolutionStatus.Optimal


def test_ipopt_bridge_exact_hessian(fake_cyipopt):
    """HessianNLP routes the exact Lagrangian Hessian to eval_h (reference
    compat/ipopt.hpp:206-213) and drops the L-BFGS approximation option."""
    from smooth_feedback_tpu.compat.ipopt_bridge import solve_nlp_ipopt
    from smooth_feedback_tpu.nlp import with_hessians

    nlp = _small_nlp()
    sol = solve_nlp_ipopt(with_hessians(nlp), np.array([0.5, 0.5]))
    assert int(sol.status) == NLPSolutionStatus.Optimal

    p = _FakeIpoptProblem.last
    assert "hessian_approximation" not in p.options
    rows, cols, hv = p.hessian_seen
    # analytic: obj_factor * H(f) + lam0 * H(g0) with H(f) = 2 I, H(g0) = 0;
    # the fake drives obj_factor = 0.5, lam = [3.0]
    H = np.zeros((2, 2))
    H[rows, cols] = hv
    np.testing.assert_allclose(H, 0.5 * 2.0 * np.eye(2), atol=1e-12)


def test_with_hessians_contracted_constraint_hessian():
    """d2g_dx2 contracts multipliers before differentiating: matches the
    analytic Hessian of lam . g on a curved constraint."""
    from smooth_feedback_tpu.nlp import NLP, with_hessians

    nlp = NLP(
        n=2, m=2,
        f=lambda x: x @ x,
        g=lambda x: jnp.asarray([x[0] * x[1], x[0] ** 3]),
        xl=jnp.asarray([-jnp.inf] * 2), xu=jnp.asarray([jnp.inf] * 2),
        gl=jnp.asarray([0.0, 0.0]), gu=jnp.asarray([1.0, 1.0]),
    )
    h = with_hessians(nlp)
    x = jnp.asarray([0.7, -1.3])
    lam = jnp.asarray([2.0, -0.5])
    np.testing.assert_allclose(h.d2f_dx2(x), 2.0 * np.eye(2), atol=1e-12)
    # H(lam0 x0 x1 + lam1 x0^3) = [[6 lam1 x0, lam0], [lam0, 0]]
    expect = np.array([[6 * (-0.5) * 0.7, 2.0], [2.0, 0.0]])
    np.testing.assert_allclose(h.d2g_dx2(x, lam), expect, atol=1e-12)


@pytest.mark.parametrize(
    "ipopt_status,expected",
    [
        (0, NLPSolutionStatus.Optimal),
        (1, NLPSolutionStatus.Optimal),
        (2, NLPSolutionStatus.PrimalInfeasible),
        (4, NLPSolutionStatus.DualInfeasible),
        (-1, NLPSolutionStatus.IterationLimit),
        (-4, NLPSolutionStatus.IterationLimit),
        (5, NLPSolutionStatus.Unknown),
        (-2, NLPSolutionStatus.Unknown),
    ],
)
def test_ipopt_bridge_status_map(fake_cyipopt, ipopt_status, expected):
    from smooth_feedback_tpu.compat.ipopt_bridge import solve_nlp_ipopt

    orig_init = _FakeIpoptProblem.__init__

    def patched(self, *a, **kw):
        orig_init(self, *a, **kw)
        self.ipopt_status = ipopt_status

    _FakeIpoptProblem.__init__ = patched
    try:
        sol = solve_nlp_ipopt(_small_nlp(), np.array([0.5, 0.5]))
    finally:
        _FakeIpoptProblem.__init__ = orig_init
    assert int(sol.status) == expected
