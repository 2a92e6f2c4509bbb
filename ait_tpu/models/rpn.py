"""Region Proposal Network: conv heads + fully-batched proposal layer.

The heads mirror lib/model/rpn/rpn.py:34-43 (3x3 conv -> 1x1 cls (2A ch) and
1x1 bbox (4A ch)).  The reference's channel-reshape softmax trick
(rpn.py:54-63) becomes an explicit [..., 2, A] split in NHWC.

The proposal layer (lib/model/rpn/proposal_layer.py:51-166) — decode, clip,
per-image {sort, CUDA NMS, zero-pad} in a host Python loop — is replaced by a
single fixed-shape on-device program: batched decode + clip + padded greedy NMS
(ops/nms.py).  This was ~0.33s/step of host/device ping-pong in the reference.

Static-canvas note: images live on a padded canvas, so anchors whose centers
fall outside the true image (which don't exist at all in the reference) have
their scores forced to -inf before top-k.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ait_tpu.ops.boxes import bbox_transform_inv, clip_boxes
from ait_tpu.ops.nms import batched_nms_topk

Dtype = Any


class RPNOut(NamedTuple):
    cls_logits: jnp.ndarray   # [B, H, W, 2, A] (bg/fg logit per anchor)
    bbox_deltas: jnp.ndarray  # [B, H, W, A*4]


class RPNHead(nn.Module):
    num_anchors: int = 3 * 3
    mid_channels: int = 512
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feat):
        a = self.num_anchors
        init = nn.initializers.normal(0.01)
        x = nn.Conv(self.mid_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=init, name="conv")(feat)
        x = nn.relu(x)
        cls = nn.Conv(2 * a, (1, 1), dtype=self.dtype, kernel_init=init,
                      name="cls_score")(x)
        bbox = nn.Conv(4 * a, (1, 1), dtype=self.dtype, kernel_init=init,
                       name="bbox_pred")(x)
        b, h, w, _ = cls.shape
        # reference channel layout: first A channels bg, next A fg (rpn.py:37,
        # proposal_layer.py:69) -> [..., 2, A]
        cls = cls.reshape(b, h, w, 2, a)
        return RPNOut(cls, bbox)


def proposal_layer(rpn_out: RPNOut, anchors: jnp.ndarray, im_info: jnp.ndarray,
                   *, pre_nms_topk: int, post_nms_topk: int,
                   nms_thresh: float, use_pallas_nms: bool = True
                   ) -> jnp.ndarray:
    """Anchors + deltas -> [B, post_nms_topk, 5] rois (batch idx in col 0).

    anchors: [H*W*A, 4] from ops.anchors.shifted_anchors (same (y, x, a)
    order as the NHWC head outputs).  im_info: [B, 3] (h, w, scale).
    """
    b, h, w, _, a = rpn_out.cls_logits.shape
    # proposals are data, not a differentiable path (the reference's
    # proposal layer has a no-op backward, proposal_layer.py:168-170);
    # stopping gradients HERE keeps the whole decode/top-k/NMS machinery —
    # including the pallas sweep, which has no JVP rule — out of autodiff
    rpn_out = RPNOut(jax.lax.stop_gradient(rpn_out.cls_logits),
                     jax.lax.stop_gradient(rpn_out.bbox_deltas))
    logits = rpn_out.cls_logits.astype(jnp.float32)
    fg_prob = nn.softmax(logits, axis=3)[..., 1, :]      # [B, H, W, A]
    scores = fg_prob.reshape(b, h * w * a)
    deltas = rpn_out.bbox_deltas.astype(jnp.float32).reshape(b, h * w * a, 4)

    proposals = bbox_transform_inv(anchors[None], deltas)
    proposals = clip_boxes(proposals, im_info[:, None, :2])

    # kill anchors centered beyond the true image inside the padded canvas
    cx = 0.5 * (anchors[:, 0] + anchors[:, 2])
    cy = 0.5 * (anchors[:, 1] + anchors[:, 3])
    inside = (cx[None] < im_info[:, None, 1]) & (cy[None] < im_info[:, None, 0])

    boxes, _, _ = batched_nms_topk(
        proposals, scores, nms_thresh, pre_nms_topk, post_nms_topk,
        valid=inside, use_pallas=use_pallas_nms)
    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=boxes.dtype)[:, None, None],
        (b, post_nms_topk, 1))
    return jnp.concatenate([batch_idx, boxes], axis=-1)
