"""Detection postprocess cap semantics vs the reference
(test_net_voc.py:424-450): strict score threshold, NMS, then a
TIE-INCLUSIVE per-image cap (`score >= max_per_image-th highest`)."""

import numpy as np
import jax.numpy as jnp

from ait_tpu.evaluation.postprocess import postprocess_detections


def _inputs(scores):
    """R non-overlapping boxes (NMS keeps all) with the given scores."""
    r = len(scores)
    rois = np.zeros((1, r, 5), np.float32)
    for i in range(r):
        rois[0, i, 1:] = [i * 50.0, 0.0, i * 50.0 + 10.0, 10.0]
    cls_prob = np.asarray(scores, np.float32).reshape(1, r, 1)
    bbox_pred = np.zeros((1, r, 4), np.float32)
    im_info = np.asarray([[600.0, 1000.0, 1.0]], np.float32)
    return (jnp.asarray(rois), jnp.asarray(cls_prob),
            jnp.asarray(bbox_pred), jnp.asarray(im_info))


def test_cap_keeps_score_ties():
    # 6 survivors, cap 4; scores: the 4th highest (0.5) ties with the 5th
    scores = [0.9, 0.8, 0.7, 0.5, 0.5, 0.3]
    dets, valid = postprocess_detections(
        *_inputs(scores), nms_thresh=0.3, max_per_image=4,
        tie_inclusive=True)
    kept = np.asarray(dets)[0][np.asarray(valid)[0]]
    # reference: image_thresh = 0.5, keep >= 0.5 -> 5 detections
    assert len(kept) == 5
    assert np.isclose(kept[:, 4].min(), 0.5)


def test_cap_noop_under_limit():
    scores = [0.9, 0.8, 0.7]
    dets, valid = postprocess_detections(
        *_inputs(scores), nms_thresh=0.3, max_per_image=4,
        tie_inclusive=True)
    assert int(np.asarray(valid).sum()) == 3


def test_truncating_mode():
    scores = [0.9, 0.8, 0.7, 0.5, 0.5, 0.3]
    dets, valid = postprocess_detections(
        *_inputs(scores), nms_thresh=0.3, max_per_image=4,
        tie_inclusive=False)
    assert np.asarray(dets).shape[1] == 4
    assert int(np.asarray(valid).sum()) == 4


def test_score_threshold_is_strict():
    # reference: scores > thresh (test_net_voc.py:424), strictly greater
    scores = [0.9, 0.05, 0.04]
    dets, valid = postprocess_detections(
        *_inputs(scores), nms_thresh=0.3, score_thresh=0.05,
        max_per_image=4)
    assert int(np.asarray(valid).sum()) == 1
