"""Fused selective-head attention as a Pallas TPU kernel.

The AIT head runs (3 x per layer) multi-head attention with the SHBlock
selective-head collapse over a pair batch of ~1k short (64-token) sequences
(SURVEY.md §5 long-context entry: the scale axis is the pair batch, not the
sequence).  XLA executes this as ~10 separate HBM-round-trip ops per block;
here the whole block — q/k/v projections, scaled-dot-product attention with
mask, softmax, the SK-style head gate, head collapse, output projection,
residual add and LayerNorm — runs in one kernel with every intermediate in
VMEM and the weights resident across the pair-batch grid.

Numerics match attention.MultiHeadAttention exactly.  Dropout (the
reference applies it to the post-softmax attention probabilities and to the
output projection, SubLayers.py:56-99) is supported by passing precomputed
keep-masks as kernel operands — the masks are generated with the module's
own `dropout` rng stream outside the kernel, so forward and backward see
the same masks and the VJP (which recomputes through the jnp reference) is
exact.  A custom VJP recomputes through the jnp reference for anyone who
differentiates the fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_impl(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                    mask, attn_keep=None, out_keep=None, *, n_head, d_k,
                    d_v, dist, keep_prob=1.0):
    """jnp math identical to attention.MultiHeadAttention.

    attn_keep [H, P*Tq, Tk] / out_keep [P*Tq, D] are 0/1 dropout keep-masks
    (1 = keep, value scaled by 1/keep_prob) matching flax nn.Dropout applied
    to the attention probabilities and the output projection.  Head-major
    FLAT layout: the kernel packs pairs by slicing rows (Mosaic concats are
    ~100x); pass them in a narrow float dtype (bf16) — bool crosses the
    pallas ABI as s32.
    """
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
    if attn_keep is not None:
        ak = attn_keep.reshape(n_head, p, tq, tk).transpose(1, 0, 2, 3)
        attn = attn * ak.astype(attn.dtype) * (1.0 / keep_prob)
    o = jnp.einsum("phts,phsd->phtd", attn.astype(v.dtype), v,
                   preferred_element_type=jnp.float32).astype(v.dtype)
    u = jnp.sum(o, axis=1)
    s = jnp.mean(u, axis=1)
    gate = (s @ sk_w + sk_b).reshape(p, n_head, d_v)
    gate = jax.nn.softmax(gate.astype(jnp.float32), axis=1).astype(o.dtype)
    o = jnp.sum(o * gate[:, :, None, :], axis=1)
    y = (o.reshape(p * tq, d_v) @ fc_w).reshape(p, tq, d)
    if out_keep is not None:
        y = y * out_keep.reshape(p, tq, d).astype(y.dtype) * \
            jnp.asarray(1.0 / keep_prob, y.dtype)
    y = y + x_q
    yf = y.astype(jnp.float32)
    mu = jnp.mean(yf, axis=-1, keepdims=True)
    var = jnp.mean((yf - mu) ** 2, axis=-1, keepdims=True)
    out = (yf - mu) * jax.lax.rsqrt(var + 1e-6) * ln_s + ln_b
    return out.astype(x_q.dtype)


def _pack_mask(mask, g, tq, tk):
    """Block-diagonal pack of g pairs into one [g*Tq, g*Tk] attention mask.

    The attention core's per-pair [64, 64] matmuls run the 128x128 MXU at
    25% utilization; packing g=2 pairs block-diagonally doubles effective
    throughput.  Bitwise exact for softmax: off-block logits are -1e9, the
    row max is unchanged (each row keeps its real block), exp underflows to
    exactly 0.0 in f32, so both the softmax and every downstream matmul see
    zeros off-block.  (iota, not a numpy constant: pallas kernels cannot
    capture array constants.)"""
    ri = jax.lax.broadcasted_iota(jnp.int32, (g * tq, g * tk), 0) // tq
    ci = jax.lax.broadcasted_iota(jnp.int32, (g * tq, g * tk), 1) // tk
    # tile in f32: Mosaic cannot relayout/bitcast i1 vectors for concat
    tiled = jnp.tile(mask.astype(jnp.float32), (g, g)) > 0.5
    return (ri == ci) & tiled


def _flat_slice(m, base, g, t):
    """Rows of g consecutive pairs in a pair-major flat [p*T, d] matrix.

    Pairs are contiguous there, so 'packing' is a static, tile-aligned row
    slice — Mosaic lowers per-pair 3-D slicing + concat catastrophically
    (measured ~100x), this is free."""
    return m[base * t:(base + g) * t]


def _pair_group(p, tk):
    """Pack 2 pairs block-diagonally only when that fills the 128-wide MXU.

    For short keys (the AIT head's 64-token sequences) packing doubles MXU
    utilization.  For long keys (co-attention's ~1900 image tokens) the lane
    dim is already wide — packing would double the attention FLOPs for zero
    utilization gain and double the [Tq, Tk] live memory, so keep g=1."""
    return 2 if (p % 2 == 0 and tk <= 128) else 1


def _rng_interpret(interpret):
    """Plain interpret mode has no CPU lowering for the pltpu prng
    primitives; the TPU-semantics interpreter does (bits are a zeros stub —
    see fused_sh_attention_rngdrop docstring)."""
    return pltpu.InterpretParams() if interpret is True else interpret


def _keep_thresh(keep_prob):
    """uint32 threshold: P(bits < t) == keep_prob."""
    return jnp.uint32(min(2 ** 32 - 1, int(round(keep_prob * 2 ** 32))))


_ATTN_TAG, _OUT_TAG = 1, 2

# Backward recompute policy: when True, the forward kernel also emits the
# per-head q/k/v projections (f32, post-scale for q) and the backward reads
# them instead of recomputing.  Bitwise identical gradients either way (the
# saved values are exactly what the recompute produced); built, gated green
# on chip, and A/B'd on the full step: 87.5 -> 80.1 pairs/sec — the ~400 MB
# per MHA of extra f32 residual HBM traffic costs MORE than the recompute
# it saves (the projection dots overlap the kernel's memory pipeline;
# reads/writes of the saved blocks do not).  Default OFF per that
# measurement; kept in-tree for other shape regimes (PERFORMANCE.md).
_SAVE_QKV = False


def _save_qkv_ok(tq, tk):
    """save-qkv is the SHORT-sequence (AIT head) policy only: at the
    long-seq co-attention shapes the extra [H, pt*Tk, d] blocks push the
    backward kernel past its 64 MB scoped-VMEM budget (measured 67.1 MB at
    8x64x1900), and the projections there are a small fraction of the
    block's FLOPs anyway — the long-seq backward keeps the recompute."""
    return _SAVE_QKV and tq <= 128 and tk <= 128


def _seed2(seed_ref, tag, h, pair):
    """Fold (tag, head, absolute pair) into the second seed word — hardware
    Mosaic supports at most 2 prng_seed values.  code = (tag*8+h) << 24 |
    pair is unique for pair < 2^24 (tag<=2, h<8), so every (stream, pair)
    gets a distinct seed for a fixed user seed."""
    code = (tag * 8 + h) * (1 << 24) + pair
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ code)


def _gen_attn_rows(seed_ref, h, abs_pair0, g, tq, tk, thresh, dtype):
    """In-kernel PRNG keep-mask rows [g*Tq, Tk] for g consecutive pairs.

    Seeded per (head, ABSOLUTE pair index), so the forward and backward
    kernels regenerate bit-identical masks regardless of their (different)
    pair-tile sizes."""
    rows = []
    for j in range(g):
        _seed2(seed_ref, _ATTN_TAG, h, abs_pair0 + j)
        bits = pltpu.bitcast(pltpu.prng_random_bits((tq, tk)), jnp.uint32)
        rows.append((bits < thresh).astype(dtype))
    return jnp.concatenate(rows, axis=0) if g > 1 else rows[0]


def _gen_out_rows(seed_ref, abs_pair0, p, tq, d, thresh, dtype):
    """In-kernel PRNG keep-mask [p*Tq, D] for p consecutive pairs."""
    rows = []
    for j in range(p):
        _seed2(seed_ref, _OUT_TAG, 0, abs_pair0 + j)
        bits = pltpu.bitcast(pltpu.prng_random_bits((tq, d)), jnp.uint32)
        rows.append((bits < thresh).astype(dtype))
    return jnp.concatenate(rows, axis=0) if p > 1 else rows[0]


def _oh_4d(tq):
    """Layout of the saved per-head attention outputs: flat [H, P*Tq, dv]
    when Tq is sublane-aligned (any pair tile keeps blocks 8-divisible);
    4-D [H, P, Tq, dv] for unaligned Tq (co-attention's 1900 image tokens),
    where the block's last two dims are full-size and therefore exempt from
    the 8x128 divisibility rule."""
    return tq % 8 != 0


def _kernel(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, skw_ref, skb_ref,
            fcw_ref, lns_ref, lnb_ref, mask_ref, *rest, n_head, d_k,
            d_v, dist, keep_prob, save_oh=False, save_qkv=False,
            rng_drop=False):
    """Mosaic constraints shape this kernel: the lane (minor) dimension can
    never be split by a reshape, so weights arrive per-head ([H, D, d]) and
    heads/pairs are static python loops over 2-D MXU matmuls; pairs are
    packed block-diagonally in groups of 2 to fill the 128-wide MXU
    (see _pack_mask).

    With dropout, `rest` starts with (attn_keep_ref, out_keep_ref); the
    keep-masks ride the same pair-batch grid as the activations.  With
    rng_drop, `rest` starts with an SMEM seed_ref instead and the keep-masks
    are generated IN-KERNEL with the per-(head, absolute-pair) seeding of
    _gen_attn_rows/_gen_out_rows — no mask HBM traffic at all.  With
    save_oh, the per-head attention outputs are written as a second output
    ([H, P*Tq, dv] f32) so the backward kernel skips its first recompute
    pass with BITWISE-identical gradients (everything downstream of oh in
    the forward is derived from these f32 values)."""
    rest = list(rest)
    vall_ref = rest.pop() if save_qkv else None
    kall_ref = rest.pop() if save_qkv else None
    qall_ref = rest.pop() if save_qkv else None
    ohall_ref = rest.pop() if save_oh else None
    ak_ref = ok_ref = seed_ref = None
    if rng_drop:
        seed_ref, out_ref = rest
    elif len(rest) == 3:
        ak_ref, ok_ref, out_ref = rest
    else:
        (out_ref,) = rest
    xq = xq_ref[:]
    xkv = xkv_ref[:]
    p, tq, d = xq.shape
    tk = xkv.shape[1]
    xq2 = xq.reshape(p * tq, d)
    xkv2 = xkv.reshape(p * tk, d)

    g = _pair_group(p, tk)
    maskg = _pack_mask(mask_ref[:], g, tq, tk)
    scale = 1.0 / (d_k ** 0.5)
    inv_keep = 1.0 / keep_prob
    thresh = _keep_thresh(keep_prob) if rng_drop else None
    pair0 = pl.program_id(0) * p if rng_drop else None

    o_heads = []                                    # per head: [P, Tq, dv]
    u = jnp.zeros((p, tq, d_v), jnp.float32)
    for h in range(n_head):
        # flat pair-major activations: packing g pairs = a static row slice
        qh = jnp.dot(xq2, wq_ref[h],
                     preferred_element_type=jnp.float32) * scale
        kh = jnp.dot(xkv2, wk_ref[h], preferred_element_type=jnp.float32)
        vh = jnp.dot(xkv2, wv_ref[h], preferred_element_type=jnp.float32)
        if qall_ref is not None:   # _SAVE_QKV: backward reads, not recomputes
            qall_ref[h] = qh.reshape(p, tq, d_k) if _oh_4d(tq) else qh
            kall_ref[h] = kh.reshape(p, tk, d_k) if _oh_4d(tk) else kh
            vall_ref[h] = vh.reshape(p, tk, d_v) if _oh_4d(tk) else vh
        ohs = []
        for base in range(0, p, g):
            qg = _flat_slice(qh, base, g, tq)       # [g*Tq, dk]
            kg = _flat_slice(kh, base, g, tk)
            vg = _flat_slice(vh, base, g, tk)
            attn = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)     # [g*Tq, g*Tk]
            attn = jnp.where(maskg, attn, -1e9)
            if dist == "softmax":
                attn = jax.nn.softmax(attn, axis=-1)
            else:
                attn = jnp.where(maskg, attn / tk, 0.0)
            if rng_drop:
                rows = _gen_attn_rows(seed_ref, h, pair0 + base, g, tq, tk,
                                      thresh, attn.dtype)
                akg = jnp.tile(rows, (1, g)) if g > 1 else rows
                attn = attn * akg * inv_keep
            elif ak_ref is not None:
                # head-major flat keep-mask: pack = row slice + lane tile
                # (off-block attention is exactly 0 — see _pack_mask)
                rows = _flat_slice(ak_ref[h], base, g, tq).astype(attn.dtype)
                akg = jnp.tile(rows, (1, g)) if g > 1 else rows
                attn = attn * akg * inv_keep
            ohs.append(jnp.dot(attn, vg,
                               preferred_element_type=jnp.float32))
        og = jnp.concatenate(ohs, axis=0)           # [P*Tq, dv]
        if ohall_ref is not None:
            if _oh_4d(tq):
                ohall_ref[h] = og.reshape(p, tq, d_v)
            else:
                ohall_ref[h] = og
        oh = og.reshape(p, tq, d_v)
        o_heads.append(oh)
        u = u + oh

    s = jnp.mean(u, axis=1)                         # [P, dv]
    gates = []
    for h in range(n_head):
        gl = jnp.dot(s, skw_ref[h].astype(jnp.float32),
                     preferred_element_type=jnp.float32) + \
            skb_ref[h].astype(jnp.float32)
        gates.append(gl)                            # [P, dv]
    gmax = gates[0]
    for gl in gates[1:]:
        gmax = jnp.maximum(gmax, gl)
    exps = [jnp.exp(gl - gmax) for gl in gates]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    o = jnp.zeros((p, tq, d_v), jnp.float32)
    for h in range(n_head):
        gate_h = exps[h] / denom                    # [P, dv]
        o = o + o_heads[h] * gate_h[:, None, :]

    # output projection + dropout + residual + LN, all FLAT [P*Tq, D]
    y = jnp.dot(o.reshape(p * tq, d_v).astype(xq.dtype), fcw_ref[:],
                preferred_element_type=jnp.float32)
    if rng_drop:
        okf = _gen_out_rows(seed_ref, pair0, p, tq, d, thresh, y.dtype)
        y = y * okf * inv_keep
    elif ok_ref is not None:
        y = y * ok_ref[:].astype(y.dtype) * inv_keep
    y = y + xq2.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    out = (y - mu) * jax.lax.rsqrt(var + 1e-6) * \
        lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    out_ref[:] = out.reshape(p, tq, d).astype(out_ref.dtype)


def _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask,
                attn_keep=None, out_keep=None, *, n_head, d_k, d_v, dist,
                keep_prob, pair_tile, interpret, save_oh=False,
                save_qkv=False, rng_seed=None):
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

    in_specs = [
        pl.BlockSpec((pt, tq, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((pt, tk, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        full(wq.shape), full(wk.shape), full(wv.shape),
        full(sk_w.shape), full(sk_b.shape), full(fc_w.shape),
        full(ln_s.shape), full(ln_b.shape), full(mask.shape),
    ]
    operands = [x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask]
    if rng_seed is not None:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        operands += [rng_seed]
        interpret = _rng_interpret(interpret)
    elif attn_keep is not None:
        # head-major flat layouts ([H, P*Tq, Tk] / [P*Tq, D]): in-kernel
        # pair packing is then a static row slice, never a concat
        in_specs += [
            pl.BlockSpec((n_head, pt * tq, tk), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pt * tq, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [attn_keep, out_keep]

    kern = functools.partial(_kernel, n_head=n_head, d_k=d_k, d_v=d_v,
                             dist=dist, keep_prob=keep_prob, save_oh=save_oh,
                             save_qkv=save_qkv,
                             rng_drop=rng_seed is not None)

    def head_block(t, width):
        """Per-head [H, P*t, w] (or 4-D for sublane-unaligned t) output."""
        if _oh_4d(t):
            return (pl.BlockSpec((n_head, pt, t, width),
                                 lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    jax.ShapeDtypeStruct((n_head, p, t, width), jnp.float32))
        return (pl.BlockSpec((n_head, pt * t, width), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                jax.ShapeDtypeStruct((n_head, p * t, width), jnp.float32))

    out_specs = pl.BlockSpec((pt, tq, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((p, tq, d), x_q.dtype)
    if save_oh:
        oh_spec, oh_shape = head_block(tq, d_v)
        out_specs = [out_specs, oh_spec]
        out_shape = [out_shape, oh_shape]
    if save_qkv:
        assert save_oh, "save_qkv is a train-path (save_oh) extension"
        for t, width in ((tq, d_k), (tk, d_k), (tk, d_v)):
            spec, shp = head_block(t, width)
            out_specs.append(spec)
            out_shape.append(shp)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(*operands)


def _bwd_kernel(xq_ref, xkv_ref, wq_ref, wk_ref, wv_ref, skw_ref, skb_ref,
                fcw_ref, lns_ref, lnb_ref, mask_ref, *rest, n_head, d_k,
                d_v, keep_prob, rng_drop=False, have_qkv=False):
    """Fused backward: reads the forward's saved per-head attention outputs
    (oh, f32 — gate/fc/LN recompute from them is bitwise what the forward
    computed), recomputes only the attention probabilities for the softmax
    backward, and produces every cotangent in one kernel.  Weight grads
    accumulate in VMEM-resident f32 output blocks across the sequential
    pair-batch grid (init at program_id 0).

    With rng_drop the dropout keep-masks are REGENERATED in-kernel from the
    SMEM seed with the same per-(head, absolute-pair) seeding as the
    forward, so gradients see bit-identical masks at any pair tile."""
    rest = list(rest)
    (dxq_ref, dxkv_ref, dwq_ref, dwk_ref, dwv_ref, dskw_ref, dskb_ref,
     dfcw_ref, dlns_ref, dlnb_ref) = rest[-10:]
    ins = rest[:-10]
    seed_ref = ak_ref = ok_ref = None
    qall_ref = kall_ref = vall_ref = None
    if rng_drop:
        seed_ref = ins.pop(0)
    g_ref = ins.pop()
    if have_qkv:
        vall_ref = ins.pop()
        kall_ref = ins.pop()
        qall_ref = ins.pop()
    oh_ref = ins.pop()
    if ins:
        ak_ref, ok_ref = ins

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dwq_ref, dwk_ref, dwv_ref, dskw_ref, dskb_ref,
                    dfcw_ref, dlns_ref, dlnb_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    xq = xq_ref[:]
    xkv = xkv_ref[:]
    p, tq, d = xq.shape
    tk = xkv.shape[1]
    xq2 = xq.reshape(p * tq, d)
    xkv2 = xkv.reshape(p * tk, d)
    gp = _pair_group(p, tk)
    maskg = _pack_mask(mask_ref[:], gp, tq, tk)
    scale = 1.0 / (d_k ** 0.5)
    inv_keep = 1.0 / keep_prob
    thresh = _keep_thresh(keep_prob) if rng_drop else None
    pair0 = pl.program_id(0) * p if rng_drop else None

    def group_ak(h, base):
        # [g*Tq, Tk] rows of the head-major flat keep-mask, lane-tiled to
        # [g*Tq, g*Tk]: off-block attention is exactly 0, so the replicated
        # off-block mask values multiply nothing
        if rng_drop:
            rows = _gen_attn_rows(seed_ref, h, pair0 + base, gp, tq, tk,
                                  thresh, jnp.float32)
            return jnp.tile(rows, (1, gp)) if gp > 1 else rows
        if ak_ref is None:
            return None
        rows = _flat_slice(ak_ref[h], base, gp, tq).astype(jnp.float32)
        return jnp.tile(rows, (1, gp)) if gp > 1 else rows

    # ---- forward values from the saved per-head attention outputs ----
    # (f32, written by the forward kernel — everything below is bitwise
    # what the forward computed; only the softmax probabilities are
    # recomputed, in the grad loop)
    o_heads = []
    u = jnp.zeros((p, tq, d_v), jnp.float32)
    for h in range(n_head):
        oh = oh_ref[h] if _oh_4d(tq) else oh_ref[h].reshape(p, tq, d_v)
        o_heads.append(oh)
        u = u + oh

    s = jnp.mean(u, axis=1)                          # [P, dv]
    gate_logits = []
    for h in range(n_head):
        gl = jnp.dot(s, skw_ref[h].astype(jnp.float32),
                     preferred_element_type=jnp.float32) + \
            skb_ref[h].astype(jnp.float32)
        gate_logits.append(gl)
    gmax = gate_logits[0]
    for gl in gate_logits[1:]:
        gmax = jnp.maximum(gmax, gl)
    exps = [jnp.exp(gl - gmax) for gl in gate_logits]
    denom = exps[0]
    for e in exps[1:]:
        denom = denom + e
    gammas = [e / denom for e in exps]               # per head [P, dv]
    o = jnp.zeros((p, tq, d_v), jnp.float32)
    for h in range(n_head):
        o = o + o_heads[h] * gammas[h][:, None, :]

    o_cast = o.reshape(p * tq, d_v).astype(xq.dtype)
    # LN/dropout/residual section stays FLAT [P*Tq, D] (the ok mask is
    # flat; 3-D<->flat reshapes in Mosaic are not free)
    y0 = jnp.dot(o_cast, fcw_ref[:],
                 preferred_element_type=jnp.float32)
    if rng_drop:
        okf = _gen_out_rows(seed_ref, pair0, p, tq, d, thresh, jnp.float32)
        yd = y0 * okf * inv_keep
    elif ok_ref is not None:
        okf = ok_ref[:].astype(jnp.float32)
        yd = y0 * okf * inv_keep
    else:
        yd = y0
    y = yd + xq2.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + 1e-6)
    xhat = (y - mu) * r                              # [P*Tq, D]

    # ---- backward ----
    g = g_ref[:].astype(jnp.float32).reshape(p * tq, d)   # dL/dout
    dlns_ref[:] = dlns_ref[:] + jnp.sum(g * xhat, axis=0)
    dlnb_ref[:] = dlnb_ref[:] + jnp.sum(g, axis=0)
    dxhat = g * lns_ref[:].astype(jnp.float32)
    dy = r * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True) -
              xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))

    dxq_acc = dy                                     # residual branch (flat)
    dy0_flat = (dy * okf * inv_keep
                if (ok_ref is not None or rng_drop) else dy)

    dfcw_ref[:] = dfcw_ref[:] + jnp.dot(
        o_cast.astype(jnp.float32).T, dy0_flat,
        preferred_element_type=jnp.float32)
    do = jnp.dot(dy0_flat, fcw_ref[:].astype(jnp.float32).T,
                 preferred_element_type=jnp.float32).reshape(p, tq, d_v)

    # selective-head gate backward
    dgammas = [jnp.sum(do * o_heads[h], axis=1) for h in range(n_head)]
    gdot = gammas[0] * dgammas[0]
    for h in range(1, n_head):
        gdot = gdot + gammas[h] * dgammas[h]
    dgls = [gammas[h] * (dgammas[h] - gdot) for h in range(n_head)]
    ds_bar = jnp.zeros((p, d_v), jnp.float32)
    for h in range(n_head):
        dskw_ref[h] = dskw_ref[h] + jnp.dot(
            s.T, dgls[h], preferred_element_type=jnp.float32)
        dskb_ref[h] = dskb_ref[h] + jnp.sum(dgls[h], axis=0)
        ds_bar = ds_bar + jnp.dot(
            dgls[h], skw_ref[h].astype(jnp.float32).T,
            preferred_element_type=jnp.float32)
    du = ds_bar[:, None, :] / tq                     # mean over Tq

    dxkv_acc = jnp.zeros((p * tk, d), jnp.float32)
    for h in range(n_head):
        if qall_ref is not None:
            # _SAVE_QKV: the forward saved these exact f32 values
            qh = (qall_ref[h].reshape(p * tq, d_k) if _oh_4d(tq)
                  else qall_ref[h])
            kh = (kall_ref[h].reshape(p * tk, d_k) if _oh_4d(tk)
                  else kall_ref[h])
            vh = (vall_ref[h].reshape(p * tk, d_v) if _oh_4d(tk)
                  else vall_ref[h])
        else:
            # recompute per-head activations (second pass), flat pair-major
            qh = jnp.dot(xq2, wq_ref[h],
                         preferred_element_type=jnp.float32) * scale
            kh = jnp.dot(xkv2, wk_ref[h],
                         preferred_element_type=jnp.float32)
            vh = jnp.dot(xkv2, wv_ref[h],
                         preferred_element_type=jnp.float32)
        doh = (do * gammas[h][:, None, :] + du).reshape(p * tq, d_v)
        dzs, dks, dvs = [], [], []
        for base in range(0, p, gp):
            qg = _flat_slice(qh, base, gp, tq)        # [g*Tq, dk]
            kg = _flat_slice(kh, base, gp, tk)
            vg = _flat_slice(vh, base, gp, tk)
            dog = _flat_slice(doh, base, gp, tq)      # [g*Tq, dv]
            attn = jax.lax.dot_general(
                qg, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            attn = jnp.where(maskg, attn, -1e9)
            probs = jax.nn.softmax(attn, axis=-1)    # P (pre-dropout)
            akg = group_ak(h, base)
            pd = probs * akg * inv_keep if akg is not None else probs
            # off-block entries of probs/pd are exactly 0, so every
            # cross-pair term in the packed matmuls below vanishes
            dpd = jax.lax.dot_general(
                dog, vg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [g*Tq, g*Tk]
            dvs.append(jax.lax.dot_general(
                pd, dog, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))  # [g*Tk, dv]
            dprobs = dpd * akg * inv_keep if akg is not None else dpd
            rowdot = jnp.sum(probs * dprobs, axis=-1, keepdims=True)
            dsattn = probs * (dprobs - rowdot)       # [g*Tq, g*Tk]
            dzs.append(jnp.dot(dsattn, kg,
                               preferred_element_type=jnp.float32) * scale)
            dks.append(jax.lax.dot_general(
                dsattn, qg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))  # [g*Tk, dk]
        dz = jnp.concatenate(dzs, axis=0)            # [P*Tq, dk]
        dk_all = jnp.concatenate(dks, axis=0)        # [P*Tk, dk]
        dv_all = jnp.concatenate(dvs, axis=0)        # [P*Tk, dv]
        dwq_ref[h] = dwq_ref[h] + jnp.dot(
            xq2.astype(jnp.float32).T, dz,
            preferred_element_type=jnp.float32)
        dwk_ref[h] = dwk_ref[h] + jnp.dot(
            xkv2.astype(jnp.float32).T, dk_all,
            preferred_element_type=jnp.float32)
        dwv_ref[h] = dwv_ref[h] + jnp.dot(
            xkv2.astype(jnp.float32).T, dv_all,
            preferred_element_type=jnp.float32)
        dxq_acc = dxq_acc + jnp.dot(
            dz, wq_ref[h].astype(jnp.float32).T,
            preferred_element_type=jnp.float32)
        dxkv_acc = dxkv_acc + (
            jnp.dot(dk_all, wk_ref[h].astype(jnp.float32).T,
                    preferred_element_type=jnp.float32) +
            jnp.dot(dv_all, wv_ref[h].astype(jnp.float32).T,
                    preferred_element_type=jnp.float32))

    dxq_ref[:] = dxq_acc.reshape(p, tq, d).astype(dxq_ref.dtype)
    dxkv_ref[:] = dxkv_acc.reshape(p, tk, d).astype(dxkv_ref.dtype)


def _fused_bwd_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                    mask, attn_keep, out_keep, oh_all, g, *, n_head, d_k,
                    d_v, keep_prob, pair_tile, interpret, rng_seed=None,
                    qkv=None):
    """Run the fused backward kernel; returns cotangents for the 10 array
    inputs in the ORIGINAL (pre-per-head-reshape) weight layouts.

    oh_all [H, P*Tq, dv] f32: the forward's saved per-head attention
    outputs (second output of _fused_call(save_oh=True)).  `qkv`
    (qh_all, kh_all, vh_all): the forward's saved projections
    (_SAVE_QKV) — when given the kernel reads them instead of recomputing
    (bitwise the same values)."""
    p, tq, d = x_q.shape
    tk = x_kv.shape[1]
    # the backward holds ~2.5x the forward's live intermediates (o_heads for
    # the gate backward + per-head cotangent stacks); half the fwd tile
    # keeps the kernel inside the 16MB scoped-vmem budget
    pt = min(max(1, pair_tile // 2), p)
    if p % pt != 0:
        pt = 1
    grid = (p // pt,)

    wqh = wq.reshape(d, n_head, d_k).transpose(1, 0, 2)
    wkh = wk.reshape(d, n_head, d_k).transpose(1, 0, 2)
    wvh = wv.reshape(d, n_head, d_v).transpose(1, 0, 2)
    skwh = sk_w.reshape(d_v, n_head, d_v).transpose(1, 0, 2)
    skbh = sk_b.reshape(n_head, d_v)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_pair(t, width):
        return pl.BlockSpec((pt, t, width), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [per_pair(tq, d), per_pair(tk, d),
                full(wqh.shape), full(wkh.shape), full(wvh.shape),
                full(skwh.shape), full(skbh.shape), full(fc_w.shape),
                full(ln_s.shape), full(ln_b.shape), full(mask.shape)]
    operands = [x_q, x_kv, wqh, wkh, wvh, skwh, skbh, fc_w, ln_s, ln_b,
                mask]
    if rng_seed is not None:
        in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)]
        operands += [rng_seed]
        interpret = _rng_interpret(interpret)
    elif attn_keep is not None:
        in_specs += [pl.BlockSpec((n_head, pt * tq, tk),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((pt * tq, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [attn_keep, out_keep]
    def head_block(t, width):
        if _oh_4d(t):
            return pl.BlockSpec((n_head, pt, t, width),
                                lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((n_head, pt * t, width), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    in_specs.append(head_block(tq, d_v))             # saved oh
    operands.append(oh_all)
    if qkv is not None:
        for arr, (t, width) in zip(qkv, ((tq, d_k), (tk, d_k), (tk, d_v))):
            in_specs.append(head_block(t, width))    # saved qh/kh/vh
            operands.append(arr)
    in_specs.append(per_pair(tq, d))                 # upstream cotangent
    operands.append(g)

    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((p, tq, d), x_q.dtype),      # dxq
        jax.ShapeDtypeStruct((p, tk, d), x_kv.dtype),     # dxkv
        jax.ShapeDtypeStruct((n_head, d, d_k), f32),      # dwq (per-head)
        jax.ShapeDtypeStruct((n_head, d, d_k), f32),      # dwk
        jax.ShapeDtypeStruct((n_head, d, d_v), f32),      # dwv
        jax.ShapeDtypeStruct((n_head, d_v, d_v), f32),    # dskw
        jax.ShapeDtypeStruct((n_head, d_v), f32),         # dskb
        jax.ShapeDtypeStruct((d_v, d), f32),              # dfcw
        jax.ShapeDtypeStruct((d,), f32),                  # dlns
        jax.ShapeDtypeStruct((d,), f32),                  # dlnb
    ]
    out_specs = [per_pair(tq, d), per_pair(tk, d),
                 full((n_head, d, d_k)), full((n_head, d, d_k)),
                 full((n_head, d, d_v)), full((n_head, d_v, d_v)),
                 full((n_head, d_v)), full((d_v, d)),
                 full((d,)), full((d,))]

    kern = functools.partial(_bwd_kernel, n_head=n_head, d_k=d_k, d_v=d_v,
                             keep_prob=keep_prob,
                             rng_drop=rng_seed is not None,
                             have_qkv=qkv is not None)
    (dxq, dxkv, dwq, dwk, dwv, dskw, dskb, dfcw, dlns,
     dlnb) = pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
        # the recompute+grad body keeps ~2x the forward's values live;
        # the default 16MB scoped-vmem budget is too small (v5e has 128MB)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024))(*operands)

    # back to the original weight layouts / dtypes
    dwq = dwq.transpose(1, 0, 2).reshape(d, n_head * d_k).astype(wq.dtype)
    dwk = dwk.transpose(1, 0, 2).reshape(d, n_head * d_k).astype(wk.dtype)
    dwv = dwv.transpose(1, 0, 2).reshape(d, n_head * d_v).astype(wv.dtype)
    dskw = dskw.transpose(1, 0, 2).reshape(d_v, n_head * d_v).astype(
        sk_w.dtype)
    dskb = dskb.reshape(n_head * d_v).astype(sk_b.dtype)
    dfcw = dfcw.astype(fc_w.dtype)
    return (dxq, dxkv, dwq, dwk, dwv, dskw, dskb, dfcw,
            dlns.astype(ln_s.dtype), dlnb.astype(ln_b.dtype))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(11, 12, 13, 14, 15, 16))
def fused_sh_attention(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                       mask, n_head=8, d_k=64, d_v=64, dist="softmax",
                       pair_tile=16, interpret=False):
    """Fused MHA + selective-head gate + out-proj + residual + LayerNorm.

    x_q: [P, Tq, D]; x_kv: [P, Tk, D]; mask: [Tq, Tk] bool (True=attend,
    shared across pairs — both AIT masks are pair-independent).
    """
    return _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                       mask, n_head=n_head, d_k=d_k, d_v=d_v, dist=dist,
                       keep_prob=1.0, pair_tile=pair_tile,
                       interpret=interpret)


def _fwd(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask,
         n_head, d_k, d_v, dist, pair_tile, interpret):
    qkv = None
    if dist != "softmax":
        out = _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s,
                          ln_b, mask, n_head=n_head, d_k=d_k, d_v=d_v,
                          dist=dist, keep_prob=1.0, pair_tile=pair_tile,
                          interpret=interpret)
        oh = None
    elif _save_qkv_ok(x_q.shape[1], x_kv.shape[1]):
        out, oh, *qkv = _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b,
                                    fc_w, ln_s, ln_b, mask, n_head=n_head,
                                    d_k=d_k, d_v=d_v, dist=dist,
                                    keep_prob=1.0, pair_tile=pair_tile,
                                    interpret=interpret, save_oh=True,
                                    save_qkv=True)
        qkv = tuple(qkv)
    else:
        out, oh = _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w,
                              ln_s, ln_b, mask, n_head=n_head, d_k=d_k,
                              d_v=d_v, dist=dist, keep_prob=1.0,
                              pair_tile=pair_tile, interpret=interpret,
                              save_oh=True)
    return out, (x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask,
                 oh, qkv)


def _mask_cotangent(mask):
    import numpy as np
    return np.zeros(mask.shape, dtype=jax.dtypes.float0)


def _bwd(n_head, d_k, d_v, dist, pair_tile, interpret, res, g):
    (x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask, oh,
     qkv) = res
    if dist != "softmax":
        # fused bwd kernel only implements the softmax dist; fall back to
        # gradient-of-the-reference (recompute)
        def f(*args):
            return _reference_impl(*args, n_head=n_head, d_k=d_k, d_v=d_v,
                                   dist=dist)

        _, vjp = jax.vjp(f, *res[:11])
        return vjp(g)
    grads = _fused_bwd_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s,
                            ln_b, mask, None, None, oh, g, n_head=n_head,
                            d_k=d_k, d_v=d_v, keep_prob=1.0,
                            pair_tile=pair_tile, interpret=interpret,
                            qkv=qkv)
    return grads + (_mask_cotangent(mask),)


fused_sh_attention.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(13, 14, 15, 16, 17, 18, 19))
def fused_sh_attention_dropout(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w,
                               ln_s, ln_b, mask, attn_keep, out_keep,
                               n_head=8, d_k=64, d_v=64, dist="softmax",
                               keep_prob=0.9, pair_tile=16, interpret=False):
    """Training-path variant of fused_sh_attention.

    attn_keep [P,H,Tq,Tk] / out_keep [P,Tq,D] are 0/1 keep-masks (bf16; see
    _reference_impl) for the attention-probability and output-projection
    dropouts (SubLayers.py:56, :96); kept values are scaled by 1/keep_prob
    (inverted dropout, matching flax nn.Dropout).  Masks are ordinary
    operands so the custom VJP — which recomputes through the jnp reference
    with the SAME masks — is exact.
    """
    return _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                       mask, attn_keep, out_keep, n_head=n_head, d_k=d_k,
                       d_v=d_v, dist=dist, keep_prob=keep_prob,
                       pair_tile=pair_tile, interpret=interpret)


def _fwd_drop(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask,
              attn_keep, out_keep, n_head, d_k, d_v, dist, keep_prob,
              pair_tile, interpret):
    qkv = None
    if dist != "softmax":
        out = _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s,
                          ln_b, mask, attn_keep, out_keep, n_head=n_head,
                          d_k=d_k, d_v=d_v, dist=dist, keep_prob=keep_prob,
                          pair_tile=pair_tile, interpret=interpret)
        oh = None
    elif _save_qkv_ok(x_q.shape[1], x_kv.shape[1]):
        out, oh, *qkv = _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b,
                                    fc_w, ln_s, ln_b, mask, attn_keep,
                                    out_keep, n_head=n_head, d_k=d_k,
                                    d_v=d_v, dist=dist,
                                    keep_prob=keep_prob,
                                    pair_tile=pair_tile,
                                    interpret=interpret, save_oh=True,
                                    save_qkv=True)
        qkv = tuple(qkv)
    else:
        out, oh = _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w,
                              ln_s, ln_b, mask, attn_keep, out_keep,
                              n_head=n_head, d_k=d_k, d_v=d_v, dist=dist,
                              keep_prob=keep_prob, pair_tile=pair_tile,
                              interpret=interpret, save_oh=True)
    return out, (x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask,
                 attn_keep, out_keep, oh, qkv)


def _bwd_drop(n_head, d_k, d_v, dist, keep_prob, pair_tile, interpret,
              res, g):
    (x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask, attn_keep,
     out_keep, oh, qkv) = res
    if dist != "softmax":
        def f(*args):
            return _reference_impl(*args, n_head=n_head, d_k=d_k, d_v=d_v,
                                   dist=dist, keep_prob=keep_prob)

        _, vjp = jax.vjp(f, *res[:13])
        return vjp(g)
    grads = _fused_bwd_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s,
                            ln_b, mask, attn_keep, out_keep, oh, g,
                            n_head=n_head, d_k=d_k, d_v=d_v,
                            keep_prob=keep_prob, pair_tile=pair_tile,
                            interpret=interpret, qkv=qkv)
    return grads + (_mask_cotangent(mask), jnp.zeros_like(attn_keep),
                    jnp.zeros_like(out_keep))


fused_sh_attention_dropout.defvjp(_fwd_drop, _bwd_drop)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(12, 13, 14, 15, 16, 17, 18))
def fused_sh_attention_rngdrop(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w,
                               ln_s, ln_b, mask, seed, n_head=8, d_k=64,
                               d_v=64, dist="softmax", keep_prob=0.9,
                               pair_tile=16, interpret=False):
    """Training-path variant with IN-KERNEL PRNG dropout.

    seed: [2] int32.  Keep-masks are generated inside the kernel with
    pltpu.prng seeded per (head, absolute pair index), so the fused backward
    regenerates bit-identical masks with zero mask HBM traffic (vs ~450
    MB/step of keep-mask generation + read traffic for the operand-mask
    variant at train shapes).  Dropout noise therefore differs from the
    operand-mask/flax path bit-for-bit (but not in distribution); the two
    paths are statistically equivalent Bernoulli(keep_prob) inverted
    dropout.  NOTE interpret mode: prng_random_bits is a zeros stub on CPU,
    which makes every mask all-keep — CPU tests cover plumbing and the
    keep-all limit; real-bit parity is asserted on device by
    tools/tpu_kernel_check.py via `dropout_keep_masks`.
    """
    return _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b,
                       mask, n_head=n_head, d_k=d_k, d_v=d_v, dist=dist,
                       keep_prob=keep_prob, pair_tile=pair_tile,
                       interpret=interpret, rng_seed=seed)


def _fwd_rng(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask,
             seed, n_head, d_k, d_v, dist, keep_prob, pair_tile, interpret):
    if _save_qkv_ok(x_q.shape[1], x_kv.shape[1]):
        out, oh, *qkv = _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b,
                                    fc_w, ln_s, ln_b, mask, n_head=n_head,
                                    d_k=d_k, d_v=d_v, dist=dist,
                                    keep_prob=keep_prob,
                                    pair_tile=pair_tile,
                                    interpret=interpret, save_oh=True,
                                    save_qkv=True, rng_seed=seed)
        qkv = tuple(qkv)
    else:
        out, oh = _fused_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w,
                              ln_s, ln_b, mask, n_head=n_head, d_k=d_k,
                              d_v=d_v, dist=dist, keep_prob=keep_prob,
                              pair_tile=pair_tile, interpret=interpret,
                              save_oh=True, rng_seed=seed)
        qkv = None
    return out, (x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask,
                 seed, oh, qkv)


def _bwd_rng(n_head, d_k, d_v, dist, keep_prob, pair_tile, interpret,
             res, g):
    (x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s, ln_b, mask, seed,
     oh, qkv) = res
    grads = _fused_bwd_call(x_q, x_kv, wq, wk, wv, sk_w, sk_b, fc_w, ln_s,
                            ln_b, mask, None, None, oh, g, n_head=n_head,
                            d_k=d_k, d_v=d_v, keep_prob=keep_prob,
                            pair_tile=pair_tile, interpret=interpret,
                            rng_seed=seed, qkv=qkv)
    import numpy as np
    return grads + (_mask_cotangent(mask),
                    np.zeros(seed.shape, dtype=jax.dtypes.float0))


fused_sh_attention_rngdrop.defvjp(_fwd_rng, _bwd_rng)


def dropout_keep_masks(seed, p, tq, tk, d, *, n_head=8, keep_prob=0.9,
                       interpret=False):
    """Materialize the in-kernel PRNG keep-masks as arrays.

    Returns (attn_keep [H, P*Tq, Tk], out_keep [P*Tq, D]) f32 in the
    head-major flat layouts _reference_impl consumes — the device-side
    cross-check: fused_sh_attention_rngdrop(seed) must equal
    _reference_impl(..., *dropout_keep_masks(seed)).  Grid = one pair per
    step, seeded identically to _gen_attn_rows/_gen_out_rows, so the dump
    is tiling-independent."""

    def ak_kern(seed_ref, ak_ref):
        thresh = _keep_thresh(keep_prob)   # inside: no captured constants
        i = pl.program_id(0)
        h = pl.program_id(1)
        _seed2(seed_ref, _ATTN_TAG, h, i)
        bits = pltpu.bitcast(pltpu.prng_random_bits((tq, tk)), jnp.uint32)
        ak_ref[0, 0] = (bits < thresh).astype(jnp.float32)

    def ok_kern(seed_ref, ok_ref):
        thresh = _keep_thresh(keep_prob)
        i = pl.program_id(0)
        _seed2(seed_ref, _OUT_TAG, 0, i)
        bits = pltpu.bitcast(pltpu.prng_random_bits((tq, d)), jnp.uint32)
        ok_ref[0] = (bits < thresh).astype(jnp.float32)

    # 4-D per-pair (and per-head, for ak) output blocks — full-size last
    # two block dims are legal for any Tq, incl. the co-attention's
    # unaligned 1900 — flattened to the head-major flat layouts afterwards;
    # data placement is identical to a direct flat dump.  Two separate
    # kernels with single-(pair,head) blocks keep the scoped-VMEM footprint
    # ~Tq*max(Tk,D)*4 bytes regardless of head count (one joint kernel's
    # per-pair block blew the 16 MB scoped-VMEM cap at the 1900-token
    # co-attention shapes); seeding is per (tag, head, pair), so the split
    # changes nothing about the values.
    ak = pl.pallas_call(
        ak_kern,
        grid=(p, n_head),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 1, tq, tk), lambda i, h: (h, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_head, p, tq, tk), jnp.float32),
        interpret=_rng_interpret(interpret),
    )(seed)
    ok = pl.pallas_call(
        ok_kern,
        grid=(p,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, tq, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, tq, d), jnp.float32),
        interpret=_rng_interpret(interpret),
    )(seed)
    return ak.reshape(n_head, p * tq, tk), ok.reshape(p * tq, d)
