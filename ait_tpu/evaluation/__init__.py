"""Evaluation: on-device postprocess, VOC AP, COCO AP."""

from ait_tpu.evaluation.postprocess import postprocess_detections
from ait_tpu.evaluation.voc_eval import eval_class, evaluate_voc, voc_ap

__all__ = ["postprocess_detections", "eval_class", "evaluate_voc", "voc_ap"]
