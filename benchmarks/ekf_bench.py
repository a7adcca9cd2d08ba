#!/usr/bin/env python
"""EKF throughput benchmark (BASELINE config 3): fleets of SE(2)/SO(3)
filters doing predict+update steps on one chip."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from smooth_feedback_tpu.estimators import EKFState, ekf_predict, ekf_update
from smooth_feedback_tpu.groups import SE2, SO3


def bench_group(G, name, B=4096, reps=20):
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    g0 = jax.vmap(lambda k: G.random(k, 0.2))(keys)
    states = EKFState(
        g=g0.astype(jnp.float32),
        P=jnp.tile(jnp.eye(G.ndof, dtype=jnp.float32), (B, 1, 1)),
    )
    twist = 0.1 * jnp.arange(1, G.ndof + 1, dtype=jnp.float32)
    dyn = lambda t, g: twist
    meas = lambda g: G.log(g)
    Q = 0.01 * jnp.eye(G.ndof, dtype=jnp.float32)
    R = 0.05 * jnp.eye(G.ndof, dtype=jnp.float32)

    @jax.jit
    def step(s, y):
        s = jax.vmap(lambda si: ekf_predict(G, dyn, si, Q, 0.05, n_steps=1))(s)
        s = jax.vmap(lambda si, yi: ekf_update(G, meas, si, yi, R))(s, y)
        return s

    y = jax.vmap(meas)(states.g)
    s = step(states, y)
    np.asarray(s.g[0])  # host-transfer barrier (block_until_ready can
    t0 = time.perf_counter()  # return early on some axon programs)
    for _ in range(reps):
        s = step(s, y)
    np.asarray(s.g[0])
    rate = B * reps / (time.perf_counter() - t0)
    print(f"{name}: {rate:,.0f} predict+update/sec (B={B})")


if __name__ == "__main__":
    bench_group(SO3, "SO(3)")
    bench_group(SE2, "SE(2)")
