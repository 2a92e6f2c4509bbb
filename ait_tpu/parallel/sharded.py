"""shard_map data-parallel train/eval steps.

Why not plain GSPMD (jit over sharded inputs)?  GSPMD has no partitioning
rule for `pallas_call`, so a data-sharded jit program replicates the two
Mosaic kernels (fused AIT attention, greedy-NMS sweep): it all-gathers the
full pair batch onto every chip, runs the whole kernel everywhere, and
slices the local shard back out — the kernels stop scaling exactly where
the FLOPs are.  Wrapping the WHOLE step in `shard_map` over the 'data' axis
runs every op — Pallas included — on the local batch shard, with one
explicit `pmean` where DataParallel gathered+meaned losses
(trainval_net_voc.py:391-395).

RNG: each shard folds `axis_index('data')` into its step key so dropout
masks and target-sampling decisions decorrelate across shards.  On a
1-device mesh the fold is skipped, which makes the shard_map step BITWISE
identical to the unsharded jit step — the property
tools/tpu_kernel_check.py asserts on the real chip.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

# check_vma=False: the Pallas kernels' out_shapes carry no varying-mesh-axes
# metadata (they are also called outside any mesh), which the jax>=0.9 vma
# checker rejects; correctness is covered by the replication/bitwise tests
# in tests/test_sharded_step.py.
try:  # jax>=0.4.35 exports it at top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_rep=False)

from ait_tpu.train.state import TrainState, batch_tuple, grads_and_metrics


def fused_pmean(tree, axis):
    """pmean a pytree through ONE all-reduce per distinct leaf dtype.

    A per-leaf `lax.pmean(grads, axis)` lowers to one all-reduce PER LEAF
    (154 for the flagship detector).  On real chips each collective has a
    fixed ICI latency, and on the virtual CPU mesh each is a full n-thread
    rendezvous — the 8-device dryrun spent ~95% of its wall clock
    rendezvous-thrashing on those 154 syncs.  Concatenating the raveled
    leaves (grouped by dtype, so the concat never casts) makes it one
    latency-bound sync over the same bytes; numerics per element are
    identical (same addends, same dtype, same mean-by-n).
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    groups = {}
    for i, x in enumerate(leaves):
        groups.setdefault(jnp.asarray(x).dtype, []).append(i)
    out = list(leaves)
    for idxs in groups.values():
        flat = jnp.concatenate(
            [jnp.asarray(leaves[i]).ravel() for i in idxs])
        flat = jax.lax.pmean(flat, axis)
        off = 0
        for i in idxs:
            n = leaves[i].size
            out[i] = flat[off:off + n].reshape(jnp.shape(leaves[i]))
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


def make_sharded_train_step(model, tx: optax.GradientTransformation,
                            mesh: Mesh, axis: str = "data",
                            tp_axis: str = None,
                            accum_steps: int = 1) -> Callable:
    """train_step(state, batch, rng) -> (state, metrics), shard_mapped.

    state/rng replicated, batch sharded on dim 0 over `axis`; outputs
    replicated.  Equivalent to jit(make_train_step(...)) on 1 device and to
    DataParallel's replicate/scatter/gather semantics on n.

    With `tp_axis` set (a second mesh axis; the model must be built with
    cfg.tpu.tp_size == mesh.shape[tp_axis]), the batch stays replicated over
    that axis while attention heads / FFN hidden units are computed
    shard-locally with in-model collectives; the block-sparse param grads are
    reconstructed by one psum over tp_axis (parallel/tp.py) — all other
    grads are computed replicated and need no collective.
    """
    n_shards = int(mesh.shape[axis])
    if tp_axis is not None:
        from ait_tpu.parallel.tp import tp_psum_grads

    def local_step(state: TrainState, batch, rng):
        if n_shards > 1:
            # fold the DATA shard id only: dropout/sampling draws must agree
            # across tp shards (they act on tensors replicated over tp_axis)
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        grads, metrics = grads_and_metrics(
            model, state.params, batch,
            jax.random.fold_in(rng, state.step), accum_steps)
        if tp_axis is not None:
            grads = tp_psum_grads(grads, tp_axis)
        if n_shards > 1:
            # counts are SUMS across shards: f32 (exact for < 2^24) and
            # pre-multiplied by n so the fused pmean below yields the psum
            metrics["fg_cnt"] = jnp.float32(metrics["fg_cnt"]) * n_shards
            metrics["bg_cnt"] = jnp.float32(metrics["bg_cnt"]) * n_shards
            # DataParallel's gather + .mean() (trainval_net_voc.py:391-395),
            # fused with the metric reductions into O(1) all-reduces
            grads, metrics = fused_pmean((grads, metrics), axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return shard_map(local_step, mesh,
                     in_specs=(P(), P(axis), P()),
                     out_specs=(P(), P()))


def make_sharded_eval_step(model, mesh: Mesh, axis: str = "data") -> Callable:
    """eval_step(params, batch) -> outputs, batch-sharded over `axis`."""

    def local_eval(params, batch):
        out = model.apply({"params": params}, *batch_tuple(batch),
                          train=False)
        return {"rois": out.rois, "cls_prob": out.cls_prob,
                "bbox_pred": out.bbox_pred}

    return shard_map(local_eval, mesh,
                     in_specs=(P(), P(axis)),
                     out_specs=P(axis))
