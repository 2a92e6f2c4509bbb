"""ROI Align vs. a naive numpy port of the CUDA kernel semantics
(ROIAlign_cuda.cu:64-122), both static and adaptive (ratio=0) grids."""

import pytest

import numpy as np
import jax.numpy as jnp

from ait_tpu.ops import roi_align


def np_roi_align(feat, rois, out_size, scale, ratio):
    """feat: [H, W, C]; rois: [R, 4]."""
    hh, ww, cc = feat.shape
    out = np.zeros((len(rois), out_size, out_size, cc), np.float64)

    def bilinear(y, x):
        if y < -1.0 or y > hh or x < -1.0 or x > ww:
            return np.zeros(cc)
        y = min(max(y, 0.0), hh - 1.0)
        x = min(max(x, 0.0), ww - 1.0)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, hh - 1), min(x0 + 1, ww - 1)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx)
            + feat[y1, x1] * ly * lx
        )

    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale
        rw = max(x2 - x1, 1.0)
        rh = max(y2 - y1, 1.0)
        bw, bh = rw / out_size, rh / out_size
        # adaptive grid, ROIAlign_cuda.cu:100-101
        gh = ratio if ratio > 0 else int(np.ceil(rh / out_size))
        gw = ratio if ratio > 0 else int(np.ceil(rw / out_size))
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(cc)
                for iy in range(gh):
                    for ix in range(gw):
                        y = y1 + ph * bh + (iy + 0.5) * bh / gh
                        x = x1 + pw * bw + (ix + 0.5) * bw / gw
                        acc += bilinear(y, x)
                out[r, ph, pw] = acc / (gh * gw)
    return out


@pytest.mark.parametrize("ratio", [2, 0])
def test_roi_align_matches_naive(rng, ratio):
    feat = rng.randn(1, 24, 32, 8).astype(np.float32)
    rois = np.array(
        [
            [0, 0, 111, 95],        # normal
            [100, 50, 400, 300],    # clipped past the feature map
            [37.3, 21.7, 200.1, 150.9],  # fractional
            [50, 50, 50, 50],       # degenerate -> forced 1x1
            [0, 0, 0, 0],           # zero box (padding row)
            [0, 0, 500, 380],       # whole canvas -> max adaptive grid
            [3.7, 9.1, 30.0, 22.5], # tiny -> adaptive grid = 1
        ],
        np.float32,
    )[None]
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), out_size=7,
                  spatial_scale=1 / 16.0, sampling_ratio=ratio)
    )
    ref = np_roi_align(feat[0], rois[0], 7, 1 / 16.0, ratio)
    np.testing.assert_allclose(got[0], ref, rtol=1e-4, atol=1e-4)


def test_roi_align_batched_and_differentiable(rng):
    import jax

    feat = jnp.asarray(rng.randn(2, 16, 16, 4).astype(np.float32))
    rois = jnp.asarray(
        np.tile(np.array([[8.0, 8.0, 120.0, 120.0]], np.float32), (2, 3, 1))
    )

    def loss(f):
        return roi_align(f, rois, out_size=7).sum()

    g = jax.grad(loss)(feat)
    assert g.shape == feat.shape
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0
