"""Tensor-parallel gradient reduction over the 'model' mesh axis.

With cfg.tpu.tp_size > 1 the AIT head's MultiHeadAttention and
PositionwiseFeedForward (models/attention.py) compute shard-local heads /
hidden units from BLOCK-SLICES of the replicated params: each shard's grad
for such a leaf is the full-shape array, zero outside its block, so a psum
over the model axis reconstructs the exact full gradient.  Every other leaf
(backbone, RPN, fc/LN tails, embeds) is computed identically on all model
shards — its local grad already IS the full gradient, bitwise equal across
shards, so no collective is needed.

`tp_psum_grads` applies exactly that: psum for block-sparse leaves
(identified by their stable checkpoint path suffixes), identity elsewhere.
"""

from __future__ import annotations

import functools
from typing import Any

import jax


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def replicate_for_tp(x, tp_axis: str):
    """Megatron's `f` operator: identity forward, psum backward.

    Wrap a REPLICATED activation exactly where it enters shard-local (head-
    or hidden-sliced) compute: each shard's backward contributes only its
    own heads' cotangent, and the psum here restores the full (and
    shard-identical) gradient for everything upstream.
    """
    return x


def _rep_fwd(x, tp_axis):
    return x, None


def _rep_bwd(tp_axis, _, g):
    return (jax.lax.psum(g, tp_axis),)


replicate_for_tp.defvjp(_rep_fwd, _rep_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def tp_allreduce(x, tp_axis: str):
    """Megatron's `g` operator: psum forward, identity backward.

    The cotangent of an all-reduced (replicated) value is itself replicated
    — each shard's partial already received the full downstream gradient.
    A raw lax.psum must NOT be used on a differentiated path inside
    shard_map(check_vma=False): its transpose is another psum, which
    multiplies the replicated cotangent by the axis size (verified in
    tests/test_tp.py's grad parity, which fails with raw psum).
    """
    return jax.lax.psum(x, tp_axis)


def _ar_fwd(x, tp_axis):
    return jax.lax.psum(x, tp_axis), None


def _ar_bwd(tp_axis, _, g):
    return (g,)


tp_allreduce.defvjp(_ar_fwd, _ar_bwd)

# leaves whose grads are block-sparse under tp (see attention.py):
#   w_qs/w_ks/w_vs kernels       — head column blocks
#   sh/sk kernel+bias            — per-head gate blocks
#   w_1 kernel+bias, w_2 kernel  — Megatron column/row FFN blocks
# (fc, w_2/bias and all LayerNorms run on replicated tensors -> full grads)
TP_PSUM_SUFFIXES = (
    "w_qs/kernel", "w_ks/kernel", "w_vs/kernel",
    "sh/sk/kernel", "sh/sk/bias",
    "w_1/kernel", "w_1/bias", "w_2/kernel",
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        key = getattr(p, "key", None)
        parts.append(str(key if key is not None else p))
    return "/".join(parts)


def is_tp_leaf(path) -> bool:
    s = _path_str(path)
    return any(s.endswith(suf) for suf in TP_PSUM_SUFFIXES)


def tp_psum_grads(grads: Any, tp_axis: str) -> Any:
    """Reconstruct full grads from block-sparse shard grads (inside shard_map).

    The selected leaves ride ONE all-reduce per distinct dtype (raveled and
    concatenated) rather than one per leaf — same per-element numerics,
    O(1) collective latency (see parallel/sharded.py::fused_pmean).
    """
    import jax.numpy as jnp

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(grads)
    out = [g for _, g in paths_leaves]
    groups = {}
    for i, (path, g) in enumerate(paths_leaves):
        if is_tp_leaf(path):
            groups.setdefault(jnp.asarray(g).dtype, []).append(i)
    for idxs in groups.values():
        flat = jnp.concatenate([jnp.asarray(out[i]).ravel() for i in idxs])
        flat = jax.lax.psum(flat, tp_axis)
        off = 0
        for i in idxs:
            n = out[i].size
            out[i] = flat[off:off + n].reshape(jnp.shape(out[i]))
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)
