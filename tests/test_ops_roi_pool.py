"""ROI Pool vs a naive numpy port of ROIPool_cuda.cu:17-78 semantics."""

import numpy as np
import jax.numpy as jnp

from ait_tpu.ops.roi_pool import roi_pool


def np_roi_pool(feat, rois, out_size, scale):
    hh, ww, cc = feat.shape
    out = np.zeros((len(rois), out_size, out_size, cc), np.float32)
    for r, roi in enumerate(rois):
        x1 = int(np.round(roi[0] * scale))
        y1 = int(np.round(roi[1] * scale))
        x2 = int(np.round(roi[2] * scale))
        y2 = int(np.round(roi[3] * scale))
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        # exact integer bin edges (see ops/roi_pool._bin_edges)
        for ph in range(out_size):
            for pw in range(out_size):
                hs = min(max(ph * rh // out_size + y1, 0), hh)
                he = min(max(-((ph + 1) * rh // -out_size) + y1, 0), hh)
                ws = min(max(pw * rw // out_size + x1, 0), ww)
                we = min(max(-((pw + 1) * rw // -out_size) + x1, 0), ww)
                if he > hs and we > ws:
                    out[r, ph, pw] = feat[hs:he, ws:we].reshape(-1, cc).max(0)
    return out


def test_roi_pool_matches_naive(rng):
    feat = rng.randn(1, 20, 26, 6).astype(np.float32)
    rois = np.array(
        [
            [0, 0, 200, 150],
            [40, 30, 300, 280],
            [33.3, 21.7, 190.1, 140.9],
            [50, 50, 50, 50],
            [0, 0, 0, 0],
        ],
        np.float32,
    )[None]
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(rois),
                              out_size=7, spatial_scale=1 / 16.0))
    ref = np_roi_pool(feat[0], rois[0], 7, 1 / 16.0)
    np.testing.assert_allclose(got[0], ref, rtol=1e-5, atol=1e-5)
