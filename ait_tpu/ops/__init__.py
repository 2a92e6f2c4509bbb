from ait_tpu.ops.boxes import (
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    bbox_overlaps,
    bbox_overlaps_masked,
)
from ait_tpu.ops.anchors import generate_anchors, shifted_anchors
from ait_tpu.ops.nms import nms, batched_nms_topk
from ait_tpu.ops.roi_align import roi_align
from ait_tpu.ops.roi_pool import roi_pool

__all__ = [
    "roi_pool",
    "bbox_transform",
    "bbox_transform_inv",
    "clip_boxes",
    "bbox_overlaps",
    "bbox_overlaps_masked",
    "generate_anchors",
    "shifted_anchors",
    "nms",
    "batched_nms_topk",
    "roi_align",
]
