"""smooth_feedback_tpu: TPU-native control and estimation on Lie groups.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``pettni/smooth_feedback`` (C++/Eigen reference): batched ADMM QP solving,
Lie-group MPC via linearization + collocation, ASIF safety filtering, Lie-group
EKF and PID, and a full optimal-control pipeline (flattening, Legendre–Gauss–
Radau collocation, NLP transcription, native SQP solve with mesh refinement).

Everything on the compute path is fixed-shape, jit-compatible and batchable
with ``jax.vmap``; multi-chip scaling is pure data parallelism over problem
instances via ``jax.sharding`` (see ``smooth_feedback_tpu.parallel``).
"""

from . import groups

__version__ = "0.1.0"

__all__ = ["groups", "__version__"]
