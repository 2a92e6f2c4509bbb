"""ROI Align vs. a naive numpy port of the CUDA kernel semantics
(ROIAlign_cuda.cu:64-122) with a static sampling grid."""

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
        for ph in range(out_size):
            for pw in range(out_size):
                acc = np.zeros(cc)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y1 + ph * bh + (iy + 0.5) * bh / ratio
                        x = x1 + pw * bw + (ix + 0.5) * bw / ratio
                        acc += bilinear(y, x)
                out[r, ph, pw] = acc / (ratio * ratio)
    return out


def test_roi_align_matches_naive(rng):
    feat = rng.randn(1, 24, 32, 8).astype(np.float32)
    rois = np.array(
        [
            [0, 0, 111, 95],        # normal
            [100, 50, 400, 300],    # clipped past the feature map
            [37.3, 21.7, 200.1, 150.9],  # fractional
            [50, 50, 50, 50],       # degenerate -> forced 1x1
            [0, 0, 0, 0],           # zero box (padding row)
        ],
        np.float32,
    )[None]
    got = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(rois), out_size=7,
                  spatial_scale=1 / 16.0, sampling_ratio=2)
    )
    ref = np_roi_align(feat[0], rois[0], 7, 1 / 16.0, 2)
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
