"""Test configuration: virtual 8-device CPU mesh + float64.

Numerical parity with the C++ double-precision reference requires x64; the
sharding tests need multiple devices, which we emulate on CPU (the driver
validates real multi-chip behavior separately via __graft_entry__.py).

Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var, so force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is ~95% XLA compiles (CLAUDE.md
# timings), and they are identical run to run.  Caching executables on disk
# turns every re-run after the first into a warm run.  Keyed by HLO +
# compile flags, so source changes that alter traced computations miss the
# cache naturally; stale entries are harmless (never read).
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
