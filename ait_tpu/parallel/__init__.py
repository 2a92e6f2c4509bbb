"""Mesh + sharding utilities (data-parallel pjit/shard_map over ICI/DCN)."""

from ait_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,
                                   replicated, shard_batch)
from ait_tpu.parallel.sharded import (make_sharded_eval_step,
                                      make_sharded_train_step)

__all__ = ["batch_sharding", "make_mesh", "replicate", "replicated",
           "shard_batch", "make_sharded_eval_step", "make_sharded_train_step"]
