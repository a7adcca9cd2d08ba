"""Multi-chip scaling utilities."""

from .mesh_utils import dp_mesh, replicate, shard_batch, shard_pytree

__all__ = ["dp_mesh", "shard_batch", "shard_pytree", "replicate"]
