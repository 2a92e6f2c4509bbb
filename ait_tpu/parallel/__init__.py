"""Mesh + sharding utilities: data-parallel shard_map over ICI/DCN, plus
Megatron-style tensor parallelism over a 'model' axis (tp.py)."""

from ait_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,
                                   replicated, shard_batch)
from ait_tpu.parallel.sharded import (make_sharded_eval_step,
                                      make_sharded_train_step)
from ait_tpu.parallel.tp import (replicate_for_tp, tp_allreduce,
                                 tp_psum_grads)

__all__ = ["batch_sharding", "make_mesh", "replicate", "replicated",
           "shard_batch", "make_sharded_eval_step", "make_sharded_train_step",
           "replicate_for_tp", "tp_allreduce", "tp_psum_grads"]
