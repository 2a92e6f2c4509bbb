"""Box delta encode/decode, clipping and IoU — pure jnp, broadcast-batched.

Semantics are pinned to the reference's Caffe-era conventions
(lib/model/rpn/bbox_transform.py): box widths/heights carry a `+1`
(`bbox_transform.py:16-20`), clipping clamps to `size - 1`
(`bbox_transform.py:125-133`), and the batched IoU masks zero-padded gt boxes
to 0 and zero-area candidate boxes to -1 (`bbox_transform.py:195-213`).

Unlike the reference there are no separate single/batch variants: every
function broadcasts over arbitrary leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp


def _whctr(boxes):
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return w, h, cx, cy


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Encode gt boxes as deltas w.r.t. example rois.  [..., 4] -> [..., 4].

    Reference: bbox_transform / bbox_transform_batch (bbox_transform.py:15-75).
    """
    ew, eh, ecx, ecy = _whctr(ex_rois)
    gw, gh, gcx, gcy = _whctr(gt_rois)
    dx = (gcx - ecx) / ew
    dy = (gcy - ecy) / eh
    dw = jnp.log(gw / ew)
    dh = jnp.log(gh / eh)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode deltas against boxes.  [..., 4] x [..., 4] -> [..., 4].

    Reference: bbox_transform_inv (bbox_transform.py:77-103).
    """
    w, h, cx, cy = _whctr(boxes)
    pcx = deltas[..., 0] * w + cx
    pcy = deltas[..., 1] * h + cy
    pw = jnp.exp(deltas[..., 2]) * w
    ph = jnp.exp(deltas[..., 3]) * h
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, im_hw) -> jnp.ndarray:
    """Clamp boxes to [0, W-1] x [0, H-1].

    `im_hw` is (..., 2) = (height, width) broadcastable against the box batch,
    so per-image dynamic sizes inside a padded static canvas work under jit.
    Reference: clip_boxes (bbox_transform.py:125-133).
    """
    im_hw = jnp.asarray(im_hw, boxes.dtype)
    h = im_hw[..., 0]
    w = im_hw[..., 1]
    x1 = jnp.clip(boxes[..., 0], 0.0, None)
    y1 = jnp.clip(boxes[..., 1], 0.0, None)
    x2 = jnp.clip(boxes[..., 2], 0.0, None)
    y2 = jnp.clip(boxes[..., 3], 0.0, None)
    x1 = jnp.minimum(x1, w - 1.0)
    y1 = jnp.minimum(y1, h - 1.0)
    x2 = jnp.minimum(x2, w - 1.0)
    y2 = jnp.minimum(y2, h - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_overlaps(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with +1 areas.  [..., N, 4] x [..., K, 4] -> [..., N, K].

    Reference: bbox_overlaps (bbox_transform.py:136-166).
    """
    b = boxes[..., :, None, :]
    q = query_boxes[..., None, :, :]
    iw = jnp.minimum(b[..., 2], q[..., 2]) - jnp.maximum(b[..., 0], q[..., 0]) + 1.0
    ih = jnp.minimum(b[..., 3], q[..., 3]) - jnp.maximum(b[..., 1], q[..., 1]) + 1.0
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    area_b = (boxes[..., 2] - boxes[..., 0] + 1.0) * (boxes[..., 3] - boxes[..., 1] + 1.0)
    area_q = (query_boxes[..., 2] - query_boxes[..., 0] + 1.0) * (
        query_boxes[..., 3] - query_boxes[..., 1] + 1.0
    )
    inter = iw * ih
    union = area_b[..., :, None] + area_q[..., None, :] - inter
    return inter / union


def bbox_overlaps_masked(boxes: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU with the reference's zero-padding sentinels.

    A gt box that is all zeros (area == 1 under the +1 convention) zeroes its
    whole IoU column; a zero candidate box sets its row to -1.
    Reference: bbox_overlaps_batch (bbox_transform.py:168-257).
    """
    iou = bbox_overlaps(boxes, gt_boxes)
    gt_zero = ((gt_boxes[..., 2] - gt_boxes[..., 0] + 1.0) == 1.0) & (
        (gt_boxes[..., 3] - gt_boxes[..., 1] + 1.0) == 1.0
    )
    box_zero = ((boxes[..., 2] - boxes[..., 0] + 1.0) == 1.0) & (
        (boxes[..., 3] - boxes[..., 1] + 1.0) == 1.0
    )
    iou = jnp.where(gt_zero[..., None, :], 0.0, iou)
    iou = jnp.where(box_zero[..., :, None], -1.0, iou)
    return iou
