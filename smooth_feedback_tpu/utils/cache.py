"""Persistent XLA compilation cache for applications.

The framework's jitted programs (MPC transcriptions, fused QP kernels, SQP
refinement passes) compile in 20-500 s on TPU and are bit-identical from run
to run — a closed-loop example that executes in milliseconds can spend ten
minutes compiling on every invocation without this.  The test suite already
caches (tests/conftest.py); this helper gives applications the same lever.

Keyed by HLO + compile flags, so any source change that alters the traced
computation misses the cache naturally; stale entries are never read.
"""

import os

import jax

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "smooth_feedback_tpu", "jax_cache"
)


def enable_compilation_cache(path: str | None = None, min_compile_secs: float = 0.5):
    """Persist compiled XLA executables on disk across processes.

    Call once, any time before the compiles you want cached (examples call it
    at the top of ``main``).  ``path`` defaults to
    ``~/.cache/smooth_feedback_tpu/jax_cache``.
    """
    path = path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
    return path
