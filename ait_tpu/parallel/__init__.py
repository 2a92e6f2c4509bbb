"""Mesh + sharding utilities (data-parallel pjit over ICI/DCN)."""

from ait_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,
                                   replicated, shard_batch)

__all__ = ["batch_sharding", "make_mesh", "replicate", "replicated",
           "shard_batch"]
