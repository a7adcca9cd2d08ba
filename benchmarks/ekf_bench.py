#!/usr/bin/env python
"""EKF throughput benchmark (BASELINE config 3): fleets of SE(2)/SO(3)
filters doing predict+update steps on one chip.

Two paths are measured:

- ``fleet``: the batch-trailing layout (`ekf_fleet_*`) with NSCAN steps
  chained per device dispatch.  A vmapped (B, n, n) covariance stack pads
  n -> 128 TPU lanes (~110x waste at n=3); the (n, n, B) fleet layout puts
  the batch on the lanes instead — measured ~12x faster.
- ``vmap``: the reference-style per-member layout (`jax.vmap(ekf_*)`),
  one dispatch per step (the round-2 protocol, kept for comparison).

Measurements use fresh per-step measurement noise (the axon tunnel memoizes
identical dispatches) and a host-transfer barrier (`block_until_ready` can
return early on some axon programs).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.estimators import (
    EKFState,
    ekf_fleet_predict,
    ekf_fleet_reset,
    ekf_fleet_update,
    ekf_predict,
    ekf_update,
    sqrt_ekf_fleet_predict,
    sqrt_ekf_fleet_reset,
    sqrt_ekf_fleet_update,
)
from smooth_feedback_tpu.groups import SE2, SO3
from smooth_feedback_tpu.utils import enable_compilation_cache

enable_compilation_cache()  # identical re-runs skip the TPU compile


def _problem(G, B):
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    g0 = jax.vmap(lambda k: G.random(k, 0.2))(keys).astype(jnp.float32)
    twist = 0.1 * jnp.arange(1, G.ndof + 1, dtype=jnp.float32)
    dyn = lambda t, g: twist
    meas = lambda g: G.log(g)
    Q = 0.01 * jnp.eye(G.ndof, dtype=jnp.float32)
    R = 0.05 * jnp.eye(G.ndof, dtype=jnp.float32)
    return g0, dyn, meas, Q, R


def bench_fleet(G, name, B=4096, nscan=100, reps=3):
    g0, dyn, meas, Q, R = _problem(G, B)
    fleet0 = ekf_fleet_reset(G, g0)

    @jax.jit
    def chain(fleet, key):
        def body(s, k):
            noise = 0.05 * jax.random.normal(k, (B, G.ndof), jnp.float32)
            y = jax.vmap(meas)(s.g) + noise
            s = ekf_fleet_predict(G, dyn, s, Q, 0.05, n_steps=1)
            s = ekf_fleet_update(G, meas, s, y, R)
            return s, None

        s, _ = jax.lax.scan(body, fleet, jax.random.split(key, nscan))
        return s

    s = chain(fleet0, jax.random.PRNGKey(1))
    np.asarray(s.g[0])  # host-transfer barrier
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        s = chain(s, jax.random.PRNGKey(100 + r))
        np.asarray(s.g[0])
        best = min(best, time.perf_counter() - t0)
    rate = B * nscan / best
    print(
        f"{name} fleet layout: {rate:,.0f} predict+update/sec "
        f"(B={B}, {best * 1e3 / nscan:.3f} ms/fleet-step)"
    )


def bench_vmap(G, name, B=4096, reps=20):
    g0, dyn, meas, Q, R = _problem(G, B)
    states = EKFState(
        g=g0, P=jnp.tile(jnp.eye(G.ndof, dtype=jnp.float32), (B, 1, 1))
    )

    @jax.jit
    def step(s, y):
        s = jax.vmap(lambda si: ekf_predict(G, dyn, si, Q, 0.05, n_steps=1))(s)
        s = jax.vmap(lambda si, yi: ekf_update(G, meas, si, yi, R))(s, y)
        return s

    y = jax.vmap(meas)(states.g)
    s = step(states, y)
    np.asarray(s.g[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        s = step(s, y)
    np.asarray(s.g[0])
    rate = B * reps / (time.perf_counter() - t0)
    print(f"{name} vmap layout:  {rate:,.0f} predict+update/sec (B={B})")


def bench_sqrt_fleet(G, name, B=4096, nscan=100, reps=3):
    g0, dyn, meas, Q, R = _problem(G, B)
    fleet0 = sqrt_ekf_fleet_reset(G, g0)

    @jax.jit
    def chain(fleet, key):
        def body(s, k):
            noise = 0.05 * jax.random.normal(k, (B, G.ndof), jnp.float32)
            y = jax.vmap(meas)(s.g) + noise
            s = sqrt_ekf_fleet_predict(G, dyn, s, Q, 0.05, n_steps=1)
            s = sqrt_ekf_fleet_update(G, meas, s, y, R)
            return s, None

        s, _ = jax.lax.scan(body, fleet, jax.random.split(key, nscan))
        return s

    s = chain(fleet0, jax.random.PRNGKey(1))
    np.asarray(s.g[0])
    best = np.inf
    for r in range(reps):
        t0 = time.perf_counter()
        s = chain(s, jax.random.PRNGKey(100 + r))
        np.asarray(s.g[0])
        best = min(best, time.perf_counter() - t0)
    rate = B * nscan / best
    print(
        f"{name} sqrt fleet:   {rate:,.0f} predict+update/sec "
        f"(B={B}, {best * 1e3 / nscan:.3f} ms/fleet-step)"
    )


if __name__ == "__main__":
    bench_fleet(SO3, "SO(3)")
    bench_fleet(SE2, "SE(2)")
    bench_sqrt_fleet(SO3, "SO(3)")
    bench_sqrt_fleet(SE2, "SE(2)")
    bench_vmap(SO3, "SO(3)")
    bench_vmap(SE2, "SE(2)")
