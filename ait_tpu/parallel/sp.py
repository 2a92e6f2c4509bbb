"""Sequence parallelism: cross-attention with keys/values sharded over a
'seq' mesh axis.

The co-attention block runs 64 query tokens against ~1900 image tokens
(per pair; more at larger canvases).  At canvas sizes where the [Tq, Tk]
score matrix or the K/V projections outgrow one chip, the image-token
sequence is the natural thing to shard: q2i (image tokens as queries) is
embarrassingly row-parallel, and i2q (image tokens as KEYS) needs a
distributed softmax — implemented here exactly, flash-attention-style:

    m   = pmax_s( max(scores_s) )          (stop-grad: the shift cancels)
    l   = psum_s( sum exp(scores_s - m) )
    out = psum_s( exp(scores_s - m) @ V_s ) / l

Three latency-bound collectives per call ([.., Tq] + [.., Tq] + the
[.., Tq, dv] output partial — no [Tq, Tk] tensor ever crosses ICI or
materializes globally), numerically the standard max-shifted softmax.

Inside shard_map(check_vma=False) a raw lax.psum must not sit on a
differentiated path (its transpose double-counts — see parallel/tp.py);
the psums here are tp.py's `tp_allreduce` custom-vjp (psum forward,
identity backward), which is the correct VJP because each shard's
partial is a genuine summand: the replicated upstream cotangent is
exactly d(psum)/d(local partial).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ait_tpu.parallel.tp import replicate_for_tp, tp_allreduce


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pmax_nograd(x, axis: str):
    """pmax with a zero VJP (lax.pmax has no differentiation rule; the
    softmax shift it computes cancels analytically, so zero is exact)."""
    return jax.lax.pmax(x, axis)


def _pmax_fwd(x, axis):
    return jax.lax.pmax(x, axis), None


def _pmax_bwd(axis, _, g):
    return (jnp.zeros_like(g),)


_pmax_nograd.defvjp(_pmax_fwd, _pmax_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _shard_summand(x, axis: str):
    """Identity forward; backward scales the cotangent by the axis size.

    shard_map(check_vma=False) divides an unmentioned (replicated) output's
    cotangent by the axis size on every shard.  tp.py's f operator undoes
    that for REPLICATED inputs by psum-ing S copies; a genuinely SHARDED
    input has exactly one owner, so its local cotangent must be scaled by
    S explicitly — measured directly in tests/test_sp.py's parity, and the
    same convention tp.py documents.
    """
    return x


def _ss_fwd(x, axis):
    return x, None


def _ss_bwd(axis, _, g):
    n = jax.lax.psum(jnp.ones((), g.dtype), axis)
    return (g * n,)


_shard_summand.defvjp(_ss_fwd, _ss_bwd)


def shard_seq(x, mesh, axis: str = "seq", dim: int = -2):
    """device_put with dimension `dim` (the key/value token dim) sharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * x.ndim
    spec[dim % x.ndim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def seq_parallel_attention(q, k_shard, v_shard, axis: str = "seq",
                           scale: float = 1.0, mask_shard=None):
    """softmax(q @ k^T * scale) @ v with k/v token-sharded over `axis`.

    Call inside shard_map.  q [..., Tq, dk] replicated over `axis`;
    k_shard/v_shard [..., Tk/S, dk|dv] the local token shard;
    mask_shard [..., Tq, Tk/S] bool (True = attend), local shard of the
    key mask.  Returns [..., Tq, dv], replicated (bitwise-identical on
    every shard).  Exact — not an approximation: the three collectives
    reconstruct the global softmax.
    """
    # q is replicated over `axis` and every shard contributes a partial
    # dL/dq (its key shard's term): Megatron's f operator (identity fwd,
    # psum bwd) reconstructs the full cotangent — see parallel/tp.py
    q = replicate_for_tp(q, axis)
    k_shard = _shard_summand(k_shard, axis)
    v_shard = _shard_summand(v_shard, axis)
    s = jnp.einsum("...qd,...kd->...qk", q, k_shard) * scale
    if mask_shard is not None:
        s = jnp.where(mask_shard, s, -jnp.inf)
    # global max for the stable shift; zero-grad (softmax is shift-
    # invariant, the analytic contribution cancels)
    m = _pmax_nograd(jnp.max(s, axis=-1), axis)
    p = jnp.exp(s - m[..., None])
    if mask_shard is not None:
        p = jnp.where(mask_shard, p, 0.0)
    l = tp_allreduce(jnp.sum(p, axis=-1), axis)           # [..., Tq]
    o = tp_allreduce(jnp.einsum("...qk,...kv->...qv", p, v_shard), axis)
    return o / l[..., None]
