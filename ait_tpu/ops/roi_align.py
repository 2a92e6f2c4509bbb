"""ROI Align as two separable interpolation contractions (MXU-friendly).

Semantics pinned to the reference CUDA kernel
(lib/model/csrc/cuda/ROIAlign_cuda.cu:64-122):
  * NO half-pixel shift and NO rounding of roi coords (`:81-89`);
  * malformed rois are forced to 1x1 (`roi_w = max(roi_w, 1)`, `:91-93`);
  * samples with y < -1 or y > H contribute zero; y in [-1, 0] clamps to 0;
  * bilinear taps are averaged over the sampling grid;
  * `sampling_ratio <= 0` selects the ADAPTIVE grid: per-roi, per-axis
    `g = ceil(roi_extent / out_size)` samples (`:100-101`) — the mode the
    reference actually runs (roi_layers/roi_align.py default ratio=0).

The adaptive grid is realized with static shapes: each axis uses a static
S_max = ceil(feature_extent / out_size) sample slots; per roi, the first
g(roi) slots get positions `(s + 0.5) * bin / g` and weight 1/g, the rest
weight 0.  Because the CUDA average is `sum / (g_h * g_w)`, it factorizes
exactly into per-axis `sum / g` folds, so adaptivity lives entirely inside
the interpolation matrices.

Instead of gathers, bilinear sampling is expressed as two dense interpolation
matrices (each row has <=2 nonzeros) contracted against the feature map:
    out[r, i, j, c] = Wy[r, i, h] * feat[h, w, c] * Wx[r, j, w]
which XLA maps straight onto the MXU.  The backward pass is the autodiff
transpose of the same contractions — deterministic, unlike the reference's
atomicAdd scatter backward (ROIAlign_cuda.cu:125+).

The sampling-grid average is folded INTO the interpolation matrices
(the average of a separable bilinear kernel factorizes exactly into the
per-axis averages), so the contractions produce the [out, out] grid
directly — no [out*s, out*s] intermediate (profiled: the unfolded version
spent ~10 ms/step on a 205 MB f32 intermediate, its layout copy, and the
2x2 reduce).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _interp_weights(start, bin_size, n_bins, n_samples, size, grid=None):
    """Per-roi 1-D bilinear interpolation matrix.

    start: [R] roi start (feature coords); bin_size: [R].
    grid: optional [R] int per-roi sample count (adaptive mode); samples
    s >= grid[r] are masked out and the fold divides by grid[r] instead of
    n_samples.
    Returns [R, n_bins, size] weights with the sample average folded in.
    """
    iy = jnp.arange(n_bins * n_samples, dtype=jnp.float32)
    ph = iy // n_samples
    s = iy % n_samples
    if grid is None:
        denom = jnp.float32(n_samples)
        valid = None
    else:
        denom = grid.astype(jnp.float32)[:, None]  # [R, 1]
        valid = s[None, :] < denom
    # sample position, ROIAlign_cuda.cu:96-101; adaptive grid :100-101
    pos = start[:, None] + ph[None, :] * bin_size[:, None] + (
        (s[None, :] + 0.5) * bin_size[:, None] / denom
    )  # [R, I]
    out_of_range = (pos < -1.0) | (pos > size)
    pos = jnp.clip(pos, 0.0, size - 1.0)
    low = jnp.floor(pos)
    frac = pos - low
    grid_ax = jnp.arange(size, dtype=jnp.float32)[None, None, :]
    w = (grid_ax == low[..., None]) * (1.0 - frac[..., None]) + (
        grid_ax == (low[..., None] + 1.0)
    ) * frac[..., None]
    # low == size-1 => high out of bounds; cuda clamps to (low=high=size-1, frac=0)
    # our clip already gives frac=0 there, so the (grid==low) term carries weight 1.
    w = jnp.where(out_of_range[..., None], 0.0, w)
    if valid is not None:
        w = jnp.where(valid[..., None], w, 0.0)
    # fold the per-axis sample average into the matrix (see module docstring)
    r = w.shape[0]
    w = w.reshape(r, n_bins, n_samples, size)
    if grid is None:
        return jnp.mean(w, axis=2)
    return jnp.sum(w, axis=2) / denom[..., None]


@functools.partial(
    jax.jit,
    static_argnames=("out_size", "spatial_scale", "sampling_ratio"),
)
def roi_align(feat: jnp.ndarray, rois: jnp.ndarray, *, out_size: int = 7,
              spatial_scale: float = 1.0 / 16.0,
              sampling_ratio: int = 0) -> jnp.ndarray:
    """feat: [B, H, W, C]; rois: [B, R, 4] (x1,y1,x2,y2, image coords).

    sampling_ratio > 0: fixed grid; <= 0: the reference's adaptive
    ceil(roi/bin) grid (exact semantics, static shapes — see module
    docstring).  Rois are assumed clipped to the image (the proposal layer
    guarantees this); adaptive grids are capped at the static
    ceil(feature_extent / out_size), which such rois cannot exceed.

    Returns [B, R, out_size, out_size, C].
    """
    _, hh, ww, _ = feat.shape
    adaptive = sampling_ratio <= 0
    sy = -(-hh // out_size) if adaptive else sampling_ratio
    sx = -(-ww // out_size) if adaptive else sampling_ratio

    def one(fm, rb):
        x1 = rb[:, 0] * spatial_scale
        y1 = rb[:, 1] * spatial_scale
        x2 = rb[:, 2] * spatial_scale
        y2 = rb[:, 3] * spatial_scale
        roi_w = jnp.maximum(x2 - x1, 1.0)
        roi_h = jnp.maximum(y2 - y1, 1.0)
        bw = roi_w / out_size
        bh = roi_h / out_size
        if adaptive:
            gy = jnp.clip(jnp.ceil(bh), 1, sy)
            gx = jnp.clip(jnp.ceil(bw), 1, sx)
        else:
            gy = gx = None
        wy = _interp_weights(y1, bh, out_size, sy, hh, gy)  # [R, PH, H]
        wx = _interp_weights(x1, bw, out_size, sx, ww, gx)  # [R, PW, W]
        wy = wy.astype(fm.dtype)
        wx = wx.astype(fm.dtype)
        # contract the LARGER spatial axis first so the [R, out, ., C]
        # intermediate carries the smaller one, and keep it in the compute
        # dtype (MXU accumulation is f32 either way; materializing the
        # ~hundreds-of-MB intermediate in f32 doubles its HBM traffic)
        if ww >= hh:
            t = jnp.einsum("rjw,hwc->rjhc", wx, fm,
                           preferred_element_type=fm.dtype)
            o = jnp.einsum("rih,rjhc->rijc", wy, t,
                           preferred_element_type=jnp.float32)
        else:
            t = jnp.einsum("rih,hwc->riwc", wy, fm,
                           preferred_element_type=fm.dtype)
            o = jnp.einsum("rjw,riwc->rijc", wx, t,
                           preferred_element_type=jnp.float32)
        return o.astype(fm.dtype)

    return jax.vmap(one)(feat, rois)
