"""Golden tests for box math vs. independent numpy re-derivations of the
reference semantics (lib/model/rpn/bbox_transform.py)."""

import numpy as np
import jax.numpy as jnp

from ait_tpu.ops import (
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    bbox_overlaps,
    bbox_overlaps_masked,
)


def _rand_boxes(rng, n, lo=0, hi=500):
    x1 = rng.uniform(lo, hi - 50, n)
    y1 = rng.uniform(lo, hi - 50, n)
    w = rng.uniform(1, 100, n)
    h = rng.uniform(1, 100, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def np_encode(ex, gt):
    ew = ex[:, 2] - ex[:, 0] + 1.0
    eh = ex[:, 3] - ex[:, 1] + 1.0
    ecx = ex[:, 0] + 0.5 * ew
    ecy = ex[:, 1] + 0.5 * eh
    gw = gt[:, 2] - gt[:, 0] + 1.0
    gh = gt[:, 3] - gt[:, 1] + 1.0
    gcx = gt[:, 0] + 0.5 * gw
    gcy = gt[:, 1] + 0.5 * gh
    return np.stack(
        [(gcx - ecx) / ew, (gcy - ecy) / eh, np.log(gw / ew), np.log(gh / eh)], 1
    )


def np_iou(a, b):
    n, k = len(a), len(b)
    out = np.zeros((n, k))
    for i in range(n):
        for j in range(k):
            iw = min(a[i, 2], b[j, 2]) - max(a[i, 0], b[j, 0]) + 1
            ih = min(a[i, 3], b[j, 3]) - max(a[i, 1], b[j, 1]) + 1
            if iw > 0 and ih > 0:
                aa = (a[i, 2] - a[i, 0] + 1) * (a[i, 3] - a[i, 1] + 1)
                ab = (b[j, 2] - b[j, 0] + 1) * (b[j, 3] - b[j, 1] + 1)
                out[i, j] = iw * ih / (aa + ab - iw * ih)
    return out


def test_encode_matches_reference_formula(rng):
    ex, gt = _rand_boxes(rng, 64), _rand_boxes(rng, 64)
    got = np.asarray(bbox_transform(jnp.asarray(ex), jnp.asarray(gt)))
    np.testing.assert_allclose(got, np_encode(ex, gt), rtol=1e-3, atol=1e-4)


def test_encode_decode_roundtrip(rng):
    # The Caffe-era convention is asymmetric: encode measures widths as
    # x2-x1+1 but decode writes corners as ctr +/- w/2, so a perfect round
    # trip recovers (x1, y1, x2+1, y2+1).  Pinned deliberately — the
    # reference has the identical behavior (bbox_transform.py:15-103).
    ex, gt = _rand_boxes(rng, 128), _rand_boxes(rng, 128)
    deltas = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
    rec = np.asarray(bbox_transform_inv(jnp.asarray(ex), deltas))
    expected = gt + np.array([0.0, 0.0, 1.0, 1.0], np.float32)
    np.testing.assert_allclose(rec, expected, rtol=1e-3, atol=1e-2)


def test_decode_batched_broadcasts(rng):
    ex = np.stack([_rand_boxes(rng, 16) for _ in range(4)])
    d = rng.randn(4, 16, 4).astype(np.float32) * 0.1
    out = bbox_transform_inv(jnp.asarray(ex), jnp.asarray(d))
    one = bbox_transform_inv(jnp.asarray(ex[2]), jnp.asarray(d[2]))
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(one), rtol=1e-6)


def test_clip(rng):
    b = _rand_boxes(rng, 32, lo=-100, hi=800)
    got = np.asarray(clip_boxes(jnp.asarray(b), jnp.asarray([600.0, 500.0])))
    assert got[:, 0].min() >= 0 and got[:, 1].min() >= 0
    assert got[:, 2].max() <= 499 and got[:, 3].max() <= 599
    # per-image sizes broadcast over a batch
    bb = np.stack([b, b])
    hw = np.array([[600.0, 500.0], [300.0, 200.0]])
    got2 = np.asarray(clip_boxes(jnp.asarray(bb), jnp.asarray(hw)[:, None, :]))
    assert got2[1, :, 2].max() <= 199 and got2[1, :, 3].max() <= 299


def test_iou_matches_naive(rng):
    a, b = _rand_boxes(rng, 40), _rand_boxes(rng, 17)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_iou_padding_sentinels(rng):
    a = _rand_boxes(rng, 10)
    a[3] = 0  # zero candidate box
    g = _rand_boxes(rng, 5)
    g[2] = 0  # zero-padded gt
    got = np.asarray(bbox_overlaps_masked(jnp.asarray(a), jnp.asarray(g)))
    # padded gt column zeroed; zero-box row = -1 and wins on overlap (ref:212-213)
    assert (np.delete(got[:, 2], 3) == 0).all()
    assert (got[3, :] == -1).all()
