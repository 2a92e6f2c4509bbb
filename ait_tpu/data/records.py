"""Dataset-agnostic record types for the one-shot detection data layer.

The reference passes around `roidb` dicts ({boxes, gt_classes, flipped,
width, height, image, img_id, ...}, roi_data_layer/roidb.py:15-48) plus a
per-class `cat_data` query-exemplar pool (pascal_voc.py:94-98,278-282).
These are the typed equivalents.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, List

import numpy as np


@dataclass
class ImageRecord:
    img_id: Any
    image_path: str
    width: int
    height: int
    boxes: np.ndarray          # [N, 4] float32, x1,y1,x2,y2 (0-based)
    gt_classes: np.ndarray     # [N] int32 (dataset class indices, 0 = bg)
    difficult: np.ndarray      # [N] int32 (VOC 'difficult' flag; 0 for COCO)
    flipped: bool = False

    def flipped_copy(self) -> "ImageRecord":
        """Horizontal flip (imdb.append_flipped_images, imdb.py:114-129)."""
        boxes = self.boxes.copy()
        oldx1 = boxes[:, 0].copy()
        oldx2 = boxes[:, 2].copy()
        boxes[:, 0] = self.width - oldx2 - 1
        boxes[:, 2] = self.width - oldx1 - 1
        return dataclasses.replace(self, boxes=boxes, flipped=True)


@dataclass
class QueryExemplar:
    """One query crop candidate (an annotated gt box in some image)."""
    image_path: str
    box: np.ndarray            # [4] x1,y1,x2,y2


@dataclass
class DatasetView:
    """Everything the loader needs: records + query pools + class split."""
    name: str
    classes: tuple                      # ('__background__', ...)
    records: List[ImageRecord]
    cat_data: dict                      # class_ind -> [QueryExemplar]
    allowed_classes: List[int] = field(default_factory=list)
    # COCO only: gt index for the evaluator, built lazily from the
    # annotation json so record-cache hits skip the parse entirely
    _coco_gt: Any = field(default=None, repr=False)
    _coco_ann_file: Any = field(default=None, repr=False)

    @property
    def coco_gt(self):
        if self._coco_gt is None and self._coco_ann_file:
            from ait_tpu.data.coco import COCOGt
            self._coco_gt = COCOGt(self._coco_ann_file)
        return self._coco_gt

    @coco_gt.setter
    def coco_gt(self, gt):
        self._coco_gt = gt

    @property
    def num_classes(self) -> int:
        return len(self.classes)

    def append_flipped(self):
        self.records = self.records + [r.flipped_copy() for r in self.records]

    def filter_boxless(self):
        """Drop images without gt (roidb.py:76-89)."""
        self.records = [r for r in self.records if len(r.boxes)]

    def class_frequencies(self) -> dict:
        """Inverse-frequency sampling weights (roibatchLoader.py:365-383)."""
        counts = {c: 0 for c in self.allowed_classes}
        for r in self.records:
            for c in r.gt_classes:
                if int(c) in counts:
                    counts[int(c)] += 1
        inv = {c: 1.0 / max(n, 1) for c, n in counts.items()}
        total = sum(inv.values())
        return {c: v / total for c, v in inv.items()}
