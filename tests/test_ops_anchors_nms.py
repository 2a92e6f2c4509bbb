"""Anchors vs. the MATLAB golden table; NMS vs. naive greedy."""

import numpy as np
import jax.numpy as jnp

from ait_tpu.ops import generate_anchors, shifted_anchors, nms, batched_nms_topk
from ait_tpu.ops.nms import nms_keep_mask

# Golden: the reference generate_anchors() executed output (its MATLAB header
# table is one off — it predates the 0-indexed base anchor).
MATLAB_ANCHORS = np.array(
    [
        [-84, -40, 99, 55],
        [-176, -88, 191, 103],
        [-360, -184, 375, 199],
        [-56, -56, 71, 71],
        [-120, -120, 135, 135],
        [-248, -248, 263, 263],
        [-36, -80, 51, 95],
        [-80, -168, 95, 183],
        [-168, -344, 183, 359],
    ],
    dtype=np.float32,
)


def test_anchors_match_matlab():
    np.testing.assert_array_equal(generate_anchors(), MATLAB_ANCHORS)


def test_shifted_anchor_layout():
    a = np.asarray(shifted_anchors(2, 3, 16))
    assert a.shape == (2 * 3 * 9, 4)
    # index (y, x, a): anchor at (y=1, x=2) = base + 16*shift
    np.testing.assert_array_equal(
        a[(1 * 3 + 2) * 9 + 4], MATLAB_ANCHORS[4] + np.array([32, 16, 32, 16])
    )


def np_greedy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        bi = boxes[i]
        for j in order:
            if suppressed[j] or j == i:
                continue
            iw = min(bi[2], boxes[j, 2]) - max(bi[0], boxes[j, 0]) + 1
            ih = min(bi[3], boxes[j, 3]) - max(bi[1], boxes[j, 1]) + 1
            if iw > 0 and ih > 0:
                ai = (bi[2] - bi[0] + 1) * (bi[3] - bi[1] + 1)
                aj = (boxes[j, 2] - boxes[j, 0] + 1) * (boxes[j, 3] - boxes[j, 1] + 1)
                if iw * ih / (ai + aj - iw * ih) > thresh:
                    suppressed[j] = True
    return keep


def _clustered_boxes(rng, n):
    """Boxes in overlapping clusters — stresses suppression chains."""
    centers = rng.uniform(50, 450, (max(n // 8, 1), 2))
    idx = rng.randint(0, len(centers), n)
    c = centers[idx] + rng.randn(n, 2) * 15
    w = rng.uniform(20, 80, n)
    h = rng.uniform(20, 80, n)
    return np.stack([c[:, 0] - w / 2, c[:, 1] - h / 2, c[:, 0] + w / 2, c[:, 1] + h / 2], 1).astype(np.float32)


def test_nms_matches_naive_greedy(rng):
    for n, tile in [(50, 16), (300, 64), (1000, 256)]:
        boxes = _clustered_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        ref = np_greedy_nms(boxes, scores, 0.5)
        idx, count = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                         max_out=n, tile=tile)
        got = list(np.asarray(idx)[: int(count)])
        assert got == ref, f"n={n} tile={tile}"


def test_nms_keep_mask_respects_valid(rng):
    boxes = _clustered_boxes(rng, 64)
    order = np.argsort(-rng.uniform(0, 1, 64))
    sboxes = boxes[order]
    valid = np.ones(64, bool)
    valid[10:20] = False
    keep = np.asarray(nms_keep_mask(jnp.asarray(sboxes), jnp.asarray(valid), 0.5, tile=32))
    assert not keep[10:20].any()


def test_batched_nms_topk_shapes_and_padding(rng):
    b, n = 3, 500
    boxes = np.stack([_clustered_boxes(rng, n) for _ in range(b)])
    scores = rng.uniform(0, 1, (b, n)).astype(np.float32)
    ob, osc, ov = batched_nms_topk(
        jnp.asarray(boxes), jnp.asarray(scores), 0.7, pre_topk=400, post_topk=300,
        tile=128,
    )
    assert ob.shape == (b, 300, 4) and osc.shape == (b, 300) and ov.shape == (b, 300)
    ob, osc, ov = map(np.asarray, (ob, osc, ov))
    for i in range(b):
        k = ov[i].sum()
        # kept scores are sorted descending, padding rows are zero
        assert (np.diff(osc[i][:k]) <= 1e-6).all()
        assert (ob[i][k:] == 0).all() and (osc[i][k:] == 0).all()
        # matches naive greedy on the top-400 subset
        top = np.argsort(-scores[i], kind="stable")[:400]
        ref = np_greedy_nms(boxes[i][top], scores[i][top], 0.7)[:300]
        np.testing.assert_allclose(ob[i][: len(ref)], boxes[i][top][ref], rtol=1e-6)
