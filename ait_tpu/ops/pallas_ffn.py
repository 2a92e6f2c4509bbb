"""Fused position-wise FFN (w1/relu/w2/dropout/residual/LayerNorm) kernel.

The AIT's PositionwiseFeedForward (SubLayers.py:167-187, post-LN) runs over
the flat pair-token batch ([P*T, 512] with P*T up to 65k rows).  XLA
executes it as two big matmuls plus a tail of memory-bound elementwise +
LayerNorm passes whose backward re-reads the [N, 512] stream several times
(~7 ms/step of LN traffic in the round-1 profile).  Here the whole block —
both matmuls, relu, the output dropout, residual add and LayerNorm — runs
in one kernel over row tiles with the weights VMEM-resident, and the
backward is a second fused kernel that recomputes the forward from x (two
matmuls) and produces every cotangent in one pass.

Dropout uses the same in-kernel pltpu PRNG scheme as pallas_attention:
seeded per (stream tag, absolute row-tile), identical row tiling forward
and backward, so the masks regenerate bit-identically with zero HBM
traffic.  Interpret mode stubs the bits to zeros (= keep-all); real-bit
parity is asserted on device by tools/tpu_kernel_check.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FFN_TAG = 3
_LN_EPS = 1e-6


def _rng_interpret(interpret):
    return pltpu.InterpretParams() if interpret is True else interpret


def _keep_thresh(keep_prob):
    return jnp.uint32(min(2 ** 32 - 1, int(round(keep_prob * 2 ** 32))))


def _row_tile(n):
    """Largest row tile that divides n (tokens come in multiples of 64)."""
    for rt in (1024, 512, 256, 128, 64, 8, 1):
        if n % rt == 0:
            return rt
    return 1


def ffn_reference(x, w1, b1, w2, b2, ln_s, ln_b, keep=None,
                  keep_prob=1.0):
    """jnp math identical to attention.PositionwiseFeedForward.

    x: [N, D] (flat rows).  keep: optional [N, D] 0/1 keep-mask for the
    output dropout (flax nn.Dropout semantics, scaled by 1/keep_prob)."""
    dt = x.dtype
    y1 = jnp.dot(x, w1.astype(dt),
                 preferred_element_type=jnp.float32) + b1
    y1 = jnp.maximum(y1, 0.0).astype(dt)
    y2 = jnp.dot(y1, w2.astype(dt),
                 preferred_element_type=jnp.float32) + b2
    if keep is not None:
        y2 = y2 * keep.astype(jnp.float32) * (1.0 / keep_prob)
    y = y2 + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    out = (y - mu) * jax.lax.rsqrt(var + _LN_EPS) * ln_s + ln_b
    return out.astype(dt)


def _gen_keep(seed_ref, tile_idx, shape, thresh, dtype):
    pltpu.prng_seed(seed_ref[0], seed_ref[1] ^ (_FFN_TAG * (1 << 27)
                                                + tile_idx))
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return (bits < thresh).astype(dtype)


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref,
                *rest, keep_prob, rng_drop):
    if rng_drop:
        seed_ref, out_ref = rest
    else:
        seed_ref = None
        (out_ref,) = rest
    x = x_ref[:]
    n, d = x.shape
    y1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + \
        b1_ref[:].astype(jnp.float32)
    y1 = jnp.maximum(y1, 0.0).astype(x.dtype)
    y2 = jnp.dot(y1, w2_ref[:], preferred_element_type=jnp.float32) + \
        b2_ref[:].astype(jnp.float32)
    if rng_drop:
        thresh = _keep_thresh(keep_prob)
        keep = _gen_keep(seed_ref, pl.program_id(0), (n, d), thresh,
                         jnp.float32)
        y2 = y2 * keep * (1.0 / keep_prob)
    y = y2 + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    out = (y - mu) * jax.lax.rsqrt(var + _LN_EPS) * \
        lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, lns_ref, lnb_ref,
                *rest, keep_prob, rng_drop):
    """Recompute-from-x backward; weight grads accumulate across the grid."""
    if rng_drop:
        (seed_ref, g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
         dlns_ref, dlnb_ref) = rest
    else:
        seed_ref = None
        (g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dlns_ref,
         dlnb_ref) = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in (dw1_ref, db1_ref, dw2_ref, db2_ref, dlns_ref,
                    dlnb_ref):
            ref[:] = jnp.zeros(ref.shape, ref.dtype)

    x = x_ref[:]
    n, d = x.shape
    inv_keep = 1.0 / keep_prob

    # ---- recompute forward ----
    y1 = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + \
        b1_ref[:].astype(jnp.float32)
    relu_mask = y1 > 0.0
    y1 = jnp.maximum(y1, 0.0).astype(x.dtype)
    y2 = jnp.dot(y1, w2_ref[:], preferred_element_type=jnp.float32) + \
        b2_ref[:].astype(jnp.float32)
    if rng_drop:
        thresh = _keep_thresh(keep_prob)
        keep = _gen_keep(seed_ref, pl.program_id(0), (n, d), thresh,
                         jnp.float32)
        y2d = y2 * keep * inv_keep
    else:
        y2d = y2
    y = y2d + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (y - mu) * r

    # ---- backward ----
    g = g_ref[:].astype(jnp.float32)
    dlns_ref[:] = dlns_ref[:] + jnp.sum(g * xhat, axis=0)
    dlnb_ref[:] = dlnb_ref[:] + jnp.sum(g, axis=0)
    dxhat = g * lns_ref[:].astype(jnp.float32)
    dy = r * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True) -
              xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dy2 = dy * keep * inv_keep if rng_drop else dy
    db2_ref[:] = db2_ref[:] + jnp.sum(dy2, axis=0)
    dw2_ref[:] = dw2_ref[:] + jnp.dot(
        y1.astype(jnp.float32).T, dy2, preferred_element_type=jnp.float32)
    dy1 = jnp.dot(dy2.astype(x.dtype), w2_ref[:].T,
                  preferred_element_type=jnp.float32)
    dy1 = jnp.where(relu_mask, dy1, 0.0)
    db1_ref[:] = db1_ref[:] + jnp.sum(dy1, axis=0)
    dw1_ref[:] = dw1_ref[:] + jnp.dot(
        x.astype(jnp.float32).T, dy1, preferred_element_type=jnp.float32)
    dx = jnp.dot(dy1.astype(x.dtype), w1_ref[:].T,
                 preferred_element_type=jnp.float32) + dy
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _call(kern, x, w1, b1, w2, b2, ln_s, ln_b, extra_in, extra_in_specs,
          out_shape, out_specs, *, keep_prob, rng_drop, interpret):
    n, d = x.shape
    dh = w1.shape[1]
    rt = _row_tile(n)
    grid = (n // rt,)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((rt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [row, full((d, dh)), full((dh,)), full((dh, d)),
                full((d,)), full((d,)), full((d,))] + extra_in_specs
    return pl.pallas_call(
        functools.partial(kern, keep_prob=keep_prob, rng_drop=rng_drop),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs(row, full),
        out_shape=out_shape,
        interpret=_rng_interpret(interpret) if rng_drop else interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(x, w1.astype(x.dtype), b1, w2.astype(x.dtype), b2, ln_s, ln_b,
      *extra_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def fused_ffn(x, w1, b1, w2, b2, ln_s, ln_b, seed, keep_prob=1.0,
              interpret=False):
    """x: [N, D] flat rows -> [N, D].  seed: [2] int32 (ignored when
    keep_prob == 1.0, e.g. eval)."""
    rng_drop = keep_prob < 1.0
    extra_in = [seed] if rng_drop else []
    extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] if rng_drop else []
    return _call(_fwd_kernel, x, w1, b1, w2, b2, ln_s, ln_b, extra_in,
                 extra_specs,
                 jax.ShapeDtypeStruct(x.shape, x.dtype),
                 lambda row, full: row,
                 keep_prob=keep_prob, rng_drop=rng_drop,
                 interpret=interpret)


def _ffn_fwd(x, w1, b1, w2, b2, ln_s, ln_b, seed, keep_prob, interpret):
    out = fused_ffn(x, w1, b1, w2, b2, ln_s, ln_b, seed, keep_prob,
                    interpret)
    return out, (x, w1, b1, w2, b2, ln_s, ln_b, seed)


def _ffn_bwd(keep_prob, interpret, res, g):
    x, w1, b1, w2, b2, ln_s, ln_b, seed = res
    n, d = x.shape
    dh = w1.shape[1]
    rng_drop = keep_prob < 1.0
    extra_in = ([seed, g] if rng_drop else [g])
    extra_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)]
                   if rng_drop else [])
    f32 = jnp.float32
    out_shape = [jax.ShapeDtypeStruct((n, d), x.dtype),      # dx
                 jax.ShapeDtypeStruct((d, dh), f32),         # dw1
                 jax.ShapeDtypeStruct((dh,), f32),           # db1
                 jax.ShapeDtypeStruct((dh, d), f32),         # dw2
                 jax.ShapeDtypeStruct((d,), f32),            # db2
                 jax.ShapeDtypeStruct((d,), f32),            # dlns
                 jax.ShapeDtypeStruct((d,), f32)]            # dlnb

    def out_specs(row, full):
        return [row, full((d, dh)), full((dh,)), full((dh, d)),
                full((d,)), full((d,)), full((d,))]

    rt = _row_tile(n)
    g_spec = pl.BlockSpec((rt, d), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    dx, dw1, db1, dw2, db2, dlns, dlnb = _call(
        _bwd_kernel, x, w1, b1, w2, b2, ln_s, ln_b,
        extra_in, extra_specs + [g_spec],
        out_shape, out_specs, keep_prob=keep_prob, rng_drop=rng_drop,
        interpret=interpret)
    import numpy as np
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dlns.astype(ln_s.dtype), dlnb.astype(ln_b.dtype),
            np.zeros(seed.shape, dtype=jax.dtypes.float0))


fused_ffn.defvjp(_ffn_fwd, _ffn_bwd)


_POSLN_TAG = 4


def posln_reference(x, pos, ln_s, ln_b, keep=None, keep_prob=1.0):
    """jnp math for LN(dropout(x + pos)) — the transformer's input glue
    (Models.py:98-99,155-156: PositionalEncoding -> dropout -> layer_norm).

    x: [N, D] flat pair-major rows; pos: [T, D] with N % T == 0 (row i gets
    position i % T)."""
    t = pos.shape[0]
    n = x.shape[0]
    y = x.astype(jnp.float32) + jnp.tile(pos.astype(jnp.float32),
                                         (n // t, 1))
    if keep is not None:
        y = y * keep.astype(jnp.float32) * (1.0 / keep_prob)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    out = (y - mu) * jax.lax.rsqrt(var + _LN_EPS) * ln_s + ln_b
    return out.astype(x.dtype)


def _posln_fwd_kernel(x_ref, pos_ref, lns_ref, lnb_ref, *rest, keep_prob,
                      rng_drop):
    if rng_drop:
        seed_ref, out_ref = rest
    else:
        seed_ref = None
        (out_ref,) = rest
    x = x_ref[:]
    n, d = x.shape
    t = pos_ref.shape[0]
    y = x.astype(jnp.float32) + jnp.tile(pos_ref[:].astype(jnp.float32),
                                         (n // t, 1))
    if rng_drop:
        thresh = _keep_thresh(keep_prob)
        pltpu.prng_seed(seed_ref[0],
                        seed_ref[1] ^ (_POSLN_TAG * (1 << 27)
                                       + pl.program_id(0)))
        bits = pltpu.bitcast(pltpu.prng_random_bits((n, d)), jnp.uint32)
        y = y * (bits < thresh).astype(jnp.float32) * (1.0 / keep_prob)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    out = (y - mu) * jax.lax.rsqrt(var + _LN_EPS) * \
        lns_ref[:].astype(jnp.float32) + lnb_ref[:].astype(jnp.float32)
    out_ref[:] = out.astype(out_ref.dtype)


def _posln_bwd_kernel(x_ref, pos_ref, lns_ref, lnb_ref, *rest, keep_prob,
                      rng_drop):
    if rng_drop:
        seed_ref, g_ref, dx_ref, dlns_ref, dlnb_ref = rest
    else:
        seed_ref = None
        g_ref, dx_ref, dlns_ref, dlnb_ref = rest

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dlns_ref[:] = jnp.zeros(dlns_ref.shape, dlns_ref.dtype)
        dlnb_ref[:] = jnp.zeros(dlnb_ref.shape, dlnb_ref.dtype)

    x = x_ref[:]
    n, d = x.shape
    t = pos_ref.shape[0]
    inv_keep = 1.0 / keep_prob
    y = x.astype(jnp.float32) + jnp.tile(pos_ref[:].astype(jnp.float32),
                                         (n // t, 1))
    if rng_drop:
        thresh = _keep_thresh(keep_prob)
        pltpu.prng_seed(seed_ref[0],
                        seed_ref[1] ^ (_POSLN_TAG * (1 << 27)
                                       + pl.program_id(0)))
        bits = pltpu.bitcast(pltpu.prng_random_bits((n, d)), jnp.uint32)
        keep = (bits < thresh).astype(jnp.float32)
        y = y * keep * inv_keep
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (y - mu) * r

    g = g_ref[:].astype(jnp.float32)
    dlns_ref[:] = dlns_ref[:] + jnp.sum(g * xhat, axis=0)
    dlnb_ref[:] = dlnb_ref[:] + jnp.sum(g, axis=0)
    dxhat = g * lns_ref[:].astype(jnp.float32)
    dy = r * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True) -
              xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    if rng_drop:
        dy = dy * keep * inv_keep
    dx_ref[:] = dy.astype(dx_ref.dtype)


def _posln_tile(n, t):
    """Row tile: a multiple of the position period t dividing n."""
    for rt in (1024, 512, 256, 128, 64):
        if rt % t == 0 and n % rt == 0:
            return rt
    assert n % t == 0, (n, t)
    return t


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_posln(x, pos, ln_s, ln_b, seed, keep_prob=1.0, interpret=False):
    """LN(dropout(x + pos[i % T])) over flat rows; seed [2] int32.
    Requires N % T == 0 (pair-major token rows)."""
    rng_drop = keep_prob < 1.0
    n, d = x.shape
    t = pos.shape[0]
    rt = _posln_tile(n, t)
    extra_in = [seed] if rng_drop else []
    extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] if rng_drop else []

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((rt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_posln_fwd_kernel, keep_prob=keep_prob,
                          rng_drop=rng_drop),
        grid=(n // rt,),
        in_specs=[row, full(pos.shape), full(ln_s.shape),
                  full(ln_b.shape)] + extra_specs,
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_rng_interpret(interpret) if rng_drop else interpret,
    )(x, pos, ln_s, ln_b, *extra_in)


def _posln_vjp_fwd(x, pos, ln_s, ln_b, seed, keep_prob, interpret):
    out = fused_posln(x, pos, ln_s, ln_b, seed, keep_prob, interpret)
    return out, (x, pos, ln_s, ln_b, seed)


def _posln_vjp_bwd(keep_prob, interpret, res, g):
    x, pos, ln_s, ln_b, seed = res
    n, d = x.shape
    t = pos.shape[0]
    rng_drop = keep_prob < 1.0
    rt = _posln_tile(n, t)
    extra_in = [seed] if rng_drop else []
    extra_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] if rng_drop else []

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    row = pl.BlockSpec((rt, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    dx, dlns, dlnb = pl.pallas_call(
        functools.partial(_posln_bwd_kernel, keep_prob=keep_prob,
                          rng_drop=rng_drop),
        grid=(n // rt,),
        in_specs=[row, full(pos.shape), full(ln_s.shape),
                  full(ln_b.shape)] + extra_specs + [row],
        out_specs=[row, full((d,)), full((d,))],
        out_shape=[jax.ShapeDtypeStruct((n, d), x.dtype),
                   jax.ShapeDtypeStruct((d,), f32),
                   jax.ShapeDtypeStruct((d,), f32)],
        interpret=_rng_interpret(interpret) if rng_drop else interpret,
    )(x, pos, ln_s, ln_b, *extra_in, g)
    import numpy as np
    return (dx, jnp.zeros_like(pos), dlns.astype(ln_s.dtype),
            dlnb.astype(ln_b.dtype),
            np.zeros(seed.shape, dtype=jax.dtypes.float0))


fused_posln.defvjp(_posln_vjp_fwd, _posln_vjp_bwd)


def _mask_dump(seed, n, d, rt, tag, keep_prob, interpret):
    def kern(seed_ref, out_ref):
        thresh = _keep_thresh(keep_prob)
        pltpu.prng_seed(seed_ref[0],
                        seed_ref[1] ^ (tag * (1 << 27) + pl.program_id(0)))
        bits = pltpu.bitcast(pltpu.prng_random_bits((rt, d)), jnp.uint32)
        out_ref[:] = (bits < thresh).astype(jnp.float32)

    return pl.pallas_call(
        kern,
        grid=(n // rt,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rt, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), jnp.float32),
        interpret=_rng_interpret(interpret),
    )(seed)


def ffn_keep_mask(seed, n, d, *, keep_prob=0.9, interpret=False):
    """Materialize the FFN dropout keep-mask [N, D] (device cross-checks);
    uses the same per-row-tile seeding as the fused kernels."""
    return _mask_dump(seed, n, d, _row_tile(n), _FFN_TAG, keep_prob,
                      interpret)


def posln_keep_mask(seed, n, d, t=64, *, keep_prob=0.9, interpret=False):
    """Keep-mask of the fused_posln input-glue dropout [N, D]."""
    return _mask_dump(seed, n, d, _posln_tile(n, t), _POSLN_TAG, keep_prob,
                      interpret)
