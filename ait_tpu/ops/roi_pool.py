"""ROI max-pool (POOLING_MODE='pool').

Semantics pinned to the reference CUDA kernel
(lib/model/csrc/cuda/ROIPool_cuda.cu:17-78): roi coords ROUNDED to the
feature grid (`round(x * spatial_scale)`), quantized bin edges
floor/ceil over the rounded roi, bins clipped to the map, empty bins yield 0.
Shipped configs always use 'align' (cfgs/*.yml), so this exists for knob
parity; the backward is plain autodiff of the max (deterministic, vs the
reference's argmax+atomicAdd scatter).

The max is separable (rows then cols).  Each output row/col bin covers at
most ceil(size / out_size) + 1 grid lines after quantization, so bins become
static clamped gather windows + masked max — no data-dependent shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = jnp.float32(-1e30)


def _bin_edges(start, end, n_bins, size):
    """Quantized inclusive-exclusive bin edges [R, n_bins].

    Exact integer arithmetic: floor(k*L/n) = (k*L)//n and
    ceil((k+1)*L/n) = ((k+1)*L + n - 1)//n.  The CUDA kernel does this in
    float32 (bin_size = roi/n then k*bin_size), whose value can drift by one
    cell exactly at integer-divisible boundaries AND is not stable under
    XLA's reassociation — integer math is the deterministic reading of the
    same semantics.
    """
    length = jnp.maximum(end - start + 1.0, 1.0).astype(jnp.int32)
    start = start.astype(jnp.int32)
    k = jnp.arange(n_bins, dtype=jnp.int32)
    lo = (k[None, :] * length[:, None]) // n_bins + start[:, None]
    hi = (((k[None, :] + 1) * length[:, None] + n_bins - 1) // n_bins
          + start[:, None])
    return (jnp.clip(lo, 0, size).astype(jnp.float32),
            jnp.clip(hi, 0, size).astype(jnp.float32))


def _window_max(x, lo, hi, k, axis_size):
    """Masked max over a static window of k entries starting at lo.

    x: [R, S, ...] (reduce axis 1); lo/hi: [R]; returns [R, ...].
    """
    offs = jnp.arange(k, dtype=jnp.float32)
    pos = lo[:, None] + offs[None, :]                  # [R, k]
    idx = jnp.clip(pos, 0, axis_size - 1).astype(jnp.int32)
    gathered = jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)
    valid = pos < hi[:, None]
    gathered = jnp.where(
        valid.reshape(valid.shape + (1,) * (x.ndim - 2)), gathered, NEG)
    return jnp.max(gathered, axis=1)


@functools.partial(jax.jit,
                   static_argnames=("out_size", "spatial_scale"))
def roi_pool(feat: jnp.ndarray, rois: jnp.ndarray, *, out_size: int = 7,
             spatial_scale: float = 1.0 / 16.0) -> jnp.ndarray:
    """feat: [B, H, W, C]; rois: [B, R, 4] image coords.

    Returns [B, R, out_size, out_size, C] max-pooled features.
    """
    _, hh, ww, _ = feat.shape
    k_h = -(-hh // out_size) + 1
    k_w = -(-ww // out_size) + 1

    def one(fm, rb):
        x1 = jnp.round(rb[:, 0] * spatial_scale)
        y1 = jnp.round(rb[:, 1] * spatial_scale)
        x2 = jnp.round(rb[:, 2] * spatial_scale)
        y2 = jnp.round(rb[:, 3] * spatial_scale)
        lo_y, hi_y = _bin_edges(y1, y2, out_size, hh)      # [R, P]
        lo_x, hi_x = _bin_edges(x1, x2, out_size, ww)
        r = rb.shape[0]
        f32 = fm.astype(jnp.float32)

        # rows: [R, P, W, C]
        rows = jnp.stack([
            _window_max(jnp.broadcast_to(f32[None], (r,) + f32.shape),
                        lo_y[:, ph], hi_y[:, ph], k_h, hh)
            for ph in range(out_size)], axis=1)
        # cols: [R, P, P, C]
        rows_t = rows.transpose(0, 2, 1, 3).reshape(r, ww, -1)  # [R, W, P*C]
        cells = jnp.stack([
            _window_max(rows_t, lo_x[:, pw], hi_x[:, pw], k_w, ww)
            for pw in range(out_size)], axis=1)           # [R, P, P*C]
        out = cells.reshape(r, out_size, out_size, -1)
        out = out.transpose(0, 2, 1, 3)                   # [R, ph, pw, C]
        return jnp.where(out <= NEG / 2, 0.0, out).astype(fm.dtype)

    return jax.vmap(one)(feat, rois)
