"""Fused selective-head attention as a Pallas TPU kernel.

The AIT head runs (3 x per layer) multi-head attention with the SHBlock
selective-head collapse over a pair batch of ~1k short (64-token) sequences
(SURVEY.md §5 long-context entry: the scale axis is the pair batch, not the
sequence).  XLA executes this as ~10 separate HBM-round-trip ops per block;
here the whole block — q/k/v projections, scaled-dot-product attention with
mask, softmax, the SK-style head gate, head collapse, output projection,
residual add and LayerNorm — runs in one kernel with every intermediate in
VMEM and the weights resident across the pair-batch grid.

Numerics match attention.MultiHeadAttention with dropout disabled (the
kernel is used on deterministic paths; training falls back to the XLA
implementation so dropout/autodiff semantics stay bit-identical to the
reference).  A custom VJP recomputes through the jnp reference for anyone
who differentiates the fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_impl(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                    mask, *, n_head, d_k, d_v, dist):
    """jnp math identical to attention.MultiHeadAttention (deterministic)."""
    p, tq, d = x_q.shape
    tk = x_kv.shape[1]
    q = (x_q.reshape(p * tq, d) @ wq).reshape(p, tq, n_head, d_k)
    k = (x_kv.reshape(p * tk, d) @ wk).reshape(p, tk, n_head, d_k)
    v = (x_kv.reshape(p * tk, d) @ wv).reshape(p, tk, n_head, d_v)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    attn = jnp.einsum("phtd,phsd->phts", q / (d_k ** 0.5), k,
                      preferred_element_type=jnp.float32)
    if mask is not None:
        attn = jnp.where(mask[None, None], attn, -1e9)
    if dist == "softmax":
        attn = jax.nn.softmax(attn, axis=-1)
    else:
        attn = attn / attn.shape[-1]
    o = jnp.einsum("phts,phsd->phtd", attn.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    u = jnp.sum(o, axis=1)
    s = jnp.mean(u, axis=1)
    gate = (s @ sk_w + sk_b).reshape(p, n_head, d_v)
    gate = jax.nn.softmax(gate.astype(jnp.float32), axis=1).astype(o.dtype)
    o = jnp.sum(o * gate[:, :, None, :], axis=1)
    y = (o.reshape(p * tq, d_v) @ fc_w).reshape(p, tq, d)
    y = y + x_q
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean((yf - mu) ** 2, axis=-1, keepdims=True)
    out = (yf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
    return out.astype(x_q.dtype)


def _kernel(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, skw_ref, skb_ref,
            fcw_ref, lns_ref, lnb_ref, mask_ref, out_ref, *, n_head, d_k,
            d_v, dist):
    """Mosaic constraints shape this kernel: the lane (minor) dimension can
    never be split by a reshape, so weights arrive per-head ([H, D, d]) and
    heads/pairs are static python loops over 2-D MXU matmuls."""
    xq = xq_ref[:]
    xkv = xkv_ref[:]
    p, tq, d = xq.shape
    tk = xkv.shape[1]
    xq2 = xq.reshape(p * tq, d)
    xkv2 = xkv.reshape(p * tk, d)

    mask = mask_ref[:]
    scale = 1.0 / (d_k ** 0.5)

    o_heads = []                                    # per head: [P, Tq, dv]
    u = jnp.zeros((p, tq, d_v), jnp.float32)
    for h in range(n_head):
        qh = jnp.dot(xq2, wq_ref[h], preferred_element_type=jnp.float32)
        kh = jnp.dot(xkv2, wk_ref[h], preferred_element_type=jnp.float32)
        vh = jnp.dot(xkv2, wv_ref[h], preferred_element_type=jnp.float32)
        qh = qh.reshape(p, tq, d_k) * scale
        kh = kh.reshape(p, tk, d_k)
        vh = vh.reshape(p, tk, d_v)
        ohs = []
        for pi in range(p):
            attn = jax.lax.dot_general(
                qh[pi], kh[pi], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [Tq, Tk]
            attn = jnp.where(mask, attn, -1e9)
            if dist == "softmax":
                attn = jax.nn.softmax(attn, axis=-1)
            else:
                attn = attn / tk
            ohs.append(jnp.dot(attn, vh[pi],
                               preferred_element_type=jnp.float32))
        oh = jnp.stack(ohs, axis=0)                 # [P, Tq, dv]
        o_heads.append(oh)
        u = u + oh

    s = jnp.mean(u, axis=1)                         # [P, dv]
    gates = []
    for h in range(n_head):
        g = jnp.dot(s, skw_ref[h].astype(jnp.float32),
                    preferred_element_type=jnp.float32) + \
            skb_ref[h].astype(jnp.float32)
        gates.append(g)                             # [P, dv]
    gmax = gates[0]
    for g in gates[1:]:
        gmax = jnp.maximum(gmax, g)
    exps = [jnp.exp(g - gmax) for g in gates]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    o = jnp.zeros((p, tq, d_v), jnp.float32)
    for h in range(n_head):
        gate_h = exps[h] / denom                    # [P, dv]
        o = o + o_heads[h] * gate_h[:, None, :]

    y = jnp.dot(o.reshape(p * tq, d_v).astype(xq.dtype), fcw_ref[:],
                preferred_element_type=jnp.float32)
    y = y.reshape(p, tq, d) + xq.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    out = (y - mu) * jax.lax.rsqrt(var + 1e-6) * \
        lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask,
                *, n_head, d_k, d_v, dist, pair_tile, interpret):
    p, tq, d = x_q.shape
    tk = x_kv.shape[1]
    pt = min(pair_tile, p)
    if p % pt != 0:
        pt = 1
    grid = (p // pt,)

    # per-head weight layout (Mosaic cannot split the lane dim in-kernel)
    wq = wq.reshape(d, n_head, d_k).transpose(1, 0, 2)
    wk = wk.reshape(d, n_head, d_k).transpose(1, 0, 2)
    wv = wv.reshape(d, n_head, d_v).transpose(1, 0, 2)
    sk_w = sk_w.reshape(d_v, n_head, d_v).transpose(1, 0, 2)
    sk_b = sk_b.reshape(n_head, d_v)

    def full(shape):
        # constant index_map: the pipeline keeps these blocks resident
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, n_head=n_head, d_k=d_k, d_v=d_v,
                             dist=dist)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pt, tq, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pt, tk, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(wq.shape), full(wk.shape), full(wv.shape),
            full(sk_w.shape), full(sk_b.shape), full(fc_w.shape),
            full(ln_s.shape), full(ln_b.shape), full(mask.shape),
        ],
        out_specs=pl.BlockSpec((pt, tq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, tq, d), x_q.dtype),
        interpret=interpret,
    )(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(11, 12, 13, 14, 15, 16))
def fused_sh_attention(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                       mask, n_head=8, d_k=64, d_v=64, dist="softmax",
                       pair_tile=8, interpret=False):
    """Fused MHA + selective-head gate + out-proj + residual + LayerNorm.

    x_q: [P, Tq, D]; x_kv: [P, Tk, D]; mask: [Tq, Tk] bool (True=attend,
    shared across pairs — both AIT masks are pair-independent).
    """
    return _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                       mask, n_head=n_head, d_k=d_k, d_v=d_v, dist=dist,
                       pair_tile=pair_tile, interpret=interpret)


def _fwd(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask,
         n_head, d_k, d_v, dist, pair_tile, interpret):
    out = _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                      mask, n_head=n_head, d_k=d_k, d_v=d_v, dist=dist,
                      pair_tile=pair_tile, interpret=interpret)
    return out, (x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask)


def _bwd(n_head, d_k, d_v, dist, pair_tile, interpret, res, g):
    # gradient through the (cheap, memory-light) jnp reference — the kernel
    # is exact to it, so this is a valid VJP of the fused op
    def f(*args):
        return _reference_impl(*args, n_head=n_head, d_k=d_k, d_v=d_v,
                               dist=dist)

    _, vjp = jax.vjp(f, *res)
    return vjp(g)


fused_sh_attention.defvjp(_fwd, _bwd)
