"""Detection post-processing as one batched on-device program.

The reference does this per image on host (test_net_voc.py:392-450):
un-normalize the bbox deltas (x stds + means), decode against the rois, clip
to the image, rescale to original coords, threshold, sort, NMS(TEST.NMS=0.3),
cap at 100 detections.  Here it is a single fixed-shape jit over the whole
batch; output rows are (x1, y1, x2, y2, score), zero-padded with a validity
mask.
"""

from __future__ import annotations

import jax.numpy as jnp

from ait_tpu.ops.boxes import bbox_transform_inv, clip_boxes
from ait_tpu.ops.nms import batched_nms_topk


def postprocess_detections(rois, cls_prob, bbox_pred, im_info, *,
                           nms_thresh: float = 0.3, score_thresh: float = 0.0,
                           max_per_image: int = 100,
                           bbox_normalize_means=(0.0, 0.0, 0.0, 0.0),
                           bbox_normalize_stds=(0.1, 0.1, 0.2, 0.2),
                           tie_inclusive: bool = True):
    """rois [B,R,5], cls_prob [B,R,1], bbox_pred [B,R,4], im_info [B,3].

    Returns (dets [B, K, 5], valid [B, K]) in original-image coordinates,
    descending score.

    tie_inclusive=True reproduces the reference's cap exactly
    (test_net_voc.py:441-450): when more than max_per_image survive NMS, the
    cut is `score >= (max_per_image-th highest score)` — score TIES at the
    threshold are all kept, so K = R (the static candidate count) with a
    validity mask.  tie_inclusive=False truncates to exactly K =
    max_per_image rows.
    """
    means = jnp.asarray(bbox_normalize_means, jnp.float32)
    stds = jnp.asarray(bbox_normalize_stds, jnp.float32)
    deltas = bbox_pred.astype(jnp.float32) * stds + means

    boxes = bbox_transform_inv(rois[..., 1:5].astype(jnp.float32), deltas)
    boxes = clip_boxes(boxes, im_info[:, None, :2])
    boxes = boxes / im_info[:, None, 2:3]

    scores = cls_prob[..., 0].astype(jnp.float32)
    # zero-padded rois (beyond the NMS survivors) carry score from the head
    # anyway; the reference thresholds strictly (scores > thresh,
    # test_net_voc.py:424) which also kills padding rows at thresh=0 only if
    # their prob is 0 — so mark padding explicitly: a roi row of all zeros.
    real = jnp.any(rois[..., 1:5] != 0, axis=-1)
    valid = real & (scores > score_thresh)

    r = boxes.shape[1]
    post_topk = r if tie_inclusive else max_per_image
    out_b, out_s, out_v = batched_nms_topk(
        boxes, scores, nms_thresh, pre_topk=r, post_topk=post_topk,
        valid=valid)
    if tie_inclusive and r > max_per_image:
        # image_thresh = the max_per_image-th highest surviving score,
        # applied with >= only when the survivor count exceeds the cap
        n_valid = jnp.sum(out_v, axis=1)
        ranked = jnp.where(out_v, out_s, -jnp.inf)
        kth = jnp.sort(ranked, axis=1)[:, -max_per_image]
        cut = jnp.where(n_valid > max_per_image, kth, -jnp.inf)
        out_v = out_v & (out_s >= cut[:, None])
    dets = jnp.concatenate([out_b, out_s[..., None]], axis=-1)
    return dets, out_v
