"""Mesh + sharding utilities: data-parallel shard_map over ICI/DCN,
Megatron-style tensor parallelism over a 'model' axis (tp.py),
GPipe-style pipeline parallelism over a 'stage' axis (pp.py), and
sequence-parallel cross-attention over a 'seq' axis (sp.py)."""

from ait_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,
                                   replicated, shard_batch)
from ait_tpu.parallel.multihost import (allgather_object, host_local_rows,
                                        maybe_init_distributed,
                                        merge_all_boxes)
from ait_tpu.parallel.pp import (make_pipeline_apply, shard_stage_params,
                                 stack_stage_params)
from ait_tpu.parallel.sp import seq_parallel_attention, shard_seq
from ait_tpu.parallel.sharded import (fused_pmean, make_sharded_eval_step,
                                      make_sharded_train_step)
from ait_tpu.parallel.tp import (replicate_for_tp, tp_allreduce,
                                 tp_psum_grads)

__all__ = ["batch_sharding", "make_mesh", "replicate", "replicated",
           "shard_batch", "make_sharded_eval_step", "make_sharded_train_step",
           "fused_pmean", "replicate_for_tp", "tp_allreduce", "tp_psum_grads",
           "make_pipeline_apply", "shard_stage_params", "stack_stage_params",
           "seq_parallel_attention", "shard_seq", "allgather_object",
           "host_local_rows", "maybe_init_distributed", "merge_all_boxes"]
