"""Utility tests: Lie-group splines (role of smooth::Spline for the PID,
pid.hpp:142-159) and the Hessian-of-composition rule (utils/sparse.hpp:210)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smooth_feedback_tpu.controllers import PID
from smooth_feedback_tpu.groups import SE2, SO3, Rn
from smooth_feedback_tpu.utils import d2r_fog, fit_spline, spline_eval, spline_pos


def test_spline_interpolates_knots():
    key = jax.random.PRNGKey(0)
    ts = [0.0, 1.0, 2.5, 4.0]
    gs = jax.vmap(lambda k: SE2.random(k, 0.5))(jax.random.split(key, 4))
    sp = fit_spline(SE2, ts, gs, c2=False)
    for i, t in enumerate(ts):
        g = spline_pos(SE2, sp, jnp.asarray(t))
        np.testing.assert_allclose(g, gs[i], atol=1e-9)


def test_spline_velocity_consistency():
    """Returned body velocity matches finite differences of the position."""
    key = jax.random.PRNGKey(1)
    ts = [0.0, 1.0, 2.0, 3.0]
    gs = jax.vmap(lambda k: SO3.random(k, 0.4))(jax.random.split(key, 4))
    sp = fit_spline(SO3, ts, gs, c2=False)

    for t in [0.3, 1.5, 2.7]:
        g, v, a = spline_eval(SO3, sp, jnp.asarray(t))
        eps = 1e-6
        gp = spline_pos(SO3, sp, jnp.asarray(t + eps))
        gm = spline_pos(SO3, sp, jnp.asarray(t - eps))
        v_fd = SO3.rminus(gp, gm) / (2 * eps)
        np.testing.assert_allclose(v, v_fd, atol=1e-5)


def test_spline_continuity():
    """Position and velocity are continuous across knots (C^1)."""
    key = jax.random.PRNGKey(2)
    ts = [0.0, 1.0, 2.0, 3.5]
    gs = jax.vmap(lambda k: SE2.random(k, 0.6))(jax.random.split(key, 4))
    sp = fit_spline(SE2, ts, gs, c2=False)
    for tk in ts[1:-1]:
        _, v_m, _ = spline_eval(SE2, sp, jnp.asarray(tk - 1e-7))
        _, v_p, _ = spline_eval(SE2, sp, jnp.asarray(tk + 1e-7))
        np.testing.assert_allclose(v_m, v_p, atol=1e-4)


def test_spline_drives_pid():
    """PID.set_xdes with a spline trajectory (reference test_pid.cpp:66-97)."""
    key = jax.random.PRNGKey(3)
    ts = [0.0, 1.0, 2.0, 3.0]
    gs = jax.vmap(lambda k: SE2.random(k, 0.4))(jax.random.split(key, 4))
    sp = fit_spline(SE2, ts, gs, c2=False)

    pid = PID(SE2)
    pid.set_kp(2.0)
    pid.set_kd(3.0)
    pid.set_xdes(lambda t: spline_eval(SE2, sp, t))

    x = SE2.random(jax.random.PRNGKey(4), 0.3)
    v = jnp.array([0.1, -0.2, 0.05])
    u = pid(1.0, x, v)

    g_des, v_des, a_des = spline_eval(SE2, sp, jnp.asarray(1.0))
    expected = a_des + 3.0 * (v_des - v) + 2.0 * SE2.rminus(g_des, x)
    np.testing.assert_allclose(u, expected, atol=1e-9)


def test_d2r_fog_matches_autodiff():
    """Composition Hessian rule vs jax.hessian of the composition."""
    key = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(key)
    W1 = jax.random.normal(k1, (3, 4))
    W2 = jax.random.normal(k2, (2, 3))

    g = lambda x: jnp.tanh(W1 @ x)
    f = lambda y: jnp.stack([y @ y, jnp.sin(W2[0] @ y) * (W2[1] @ y)])

    x0 = jnp.array([0.3, -0.2, 0.5, 0.1])
    y0 = g(x0)

    Jf = jax.jacfwd(f)(y0)
    Hf = jax.hessian(f)(y0)
    Jg = jax.jacfwd(g)(x0)
    Hg = jax.hessian(g)(x0)

    H = d2r_fog(Jf, Hf, Jg, Hg)
    H_ref = jax.hessian(lambda x: f(g(x)))(x0)
    np.testing.assert_allclose(H, H_ref, atol=1e-10)


def test_spline_c2_acceleration_continuity():
    """c2=True drives acceleration jumps at interior knots to ~0
    (the reference's fit_spline_cubic gives a C^2 spline)."""
    key = jax.random.PRNGKey(7)
    ts = [0.0, 1.0, 2.0, 3.0, 4.5]
    gs = jax.vmap(lambda k: SE2.random(k, 0.5))(jax.random.split(key, 5))
    sp = fit_spline(SE2, ts, gs, c2=True)

    # knots still interpolated
    for i, t in enumerate(ts):
        np.testing.assert_allclose(spline_pos(SE2, sp, jnp.asarray(t)), gs[i], atol=1e-9)

    for tk in ts[1:-1]:
        _, _, a_m = spline_eval(SE2, sp, jnp.asarray(tk - 1e-5))
        _, _, a_p = spline_eval(SE2, sp, jnp.asarray(tk + 1e-5))
        np.testing.assert_allclose(a_m, a_p, atol=1e-3)

    # natural end conditions
    _, _, a0 = spline_eval(SE2, sp, jnp.asarray(ts[0] + 1e-5))
    _, _, aK = spline_eval(SE2, sp, jnp.asarray(ts[-1] - 1e-5))
    np.testing.assert_allclose(a0, np.zeros(3), atol=1e-3)
    np.testing.assert_allclose(aK, np.zeros(3), atol=1e-3)


def test_import_order_solvers_first():
    """Importing solvers BEFORE ocp must not hit a solvers.sqp <-> ocp.solve
    import cycle (regression: the NLP types live at the package top level,
    smooth_feedback_tpu/nlp.py, precisely so no such cycle exists)."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import smooth_feedback_tpu.solvers;"
        "import smooth_feedback_tpu.ocp;"
        "print('ok')"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd="/tmp"
    )
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout


def test_flops_model_composition():
    """Closed-form FLOP model sanity: composition, monotonicity, and the
    hand-counted n=m=2 ADMM iteration (4mn=16, 2n^2=8, 12(n+m)=48 -> 72)."""
    from smooth_feedback_tpu.utils import (
        admm_check_flops,
        admm_factor_flops,
        admm_iter_flops,
        device_peak_flops,
        mfu_pct,
        qp_solve_flops,
    )

    assert admm_iter_flops(2, 2) == 16 + 8 + 48
    # refinement rounds add 4n^2 each
    assert admm_iter_flops(2, 2, refine_iters=1) == admm_iter_flops(2, 2) + 16
    assert admm_check_flops(3, 5) == 6 * 2 * 5 * 3
    assert admm_factor_flops(3, 4) == 2 * 4 * 9 + 27 / 3 + 2 * 27

    total = qp_solve_flops(4, 6, 100, checks=10, factorizations=2, refine_iters=1)
    assert total == (
        100 * admm_iter_flops(4, 6, 1)
        + 10 * admm_check_flops(4, 6)
        + 2 * admm_factor_flops(4, 6)
    )

    # MFU: 197e12 flops in 1 s on a v5e = 100% of bf16 peak; unknown
    # platform -> None (CPU runs carry no utilization claim)
    assert abs(mfu_pct(197e12, 1.0, "tpu") - 100.0) < 1e-9
    assert mfu_pct(1.0, 1.0, "cpu") is None
    assert device_peak_flops("tpu") == 197e12
