"""ctypes bindings for the native eval kernels (native/libait_native.so).

The reference ships its native layer as a pybind11/Cython extension built by
lib/setup.py; here a plain C ABI + ctypes keeps the build to one `make`
invocation with no Python build machinery.  Every binding has a pure-numpy
fallback at its call site, so the .so is an accelerator, not a dependency.
Build with: make -C native
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SO_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native", "libait_native.so")

_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.ait_bbox_iou_xywh.argtypes = [
        ctypes.c_int64, _f64p, ctypes.c_int64, _f64p, _u8p, _f64p]
    lib.ait_greedy_match.argtypes = [
        ctypes.c_int64, _f64p, ctypes.c_int64, ctypes.c_int64, _f64p,
        _u8p, _u8p, _i64p, _u8p]
    lib.ait_nms_xyxy.argtypes = [
        ctypes.c_int64, _f64p, ctypes.c_double, _u8p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def bbox_iou_xywh(dt: np.ndarray, gt: np.ndarray,
                  iscrowd: np.ndarray) -> np.ndarray:
    lib = _load()
    dt = np.ascontiguousarray(dt, np.float64)
    gt = np.ascontiguousarray(gt, np.float64)
    iscrowd = np.ascontiguousarray(iscrowd, np.uint8)
    out = np.zeros((len(dt), len(gt)), np.float64)
    if len(dt) and len(gt):
        lib.ait_bbox_iou_xywh(len(dt), dt, len(gt), gt, iscrowd, out)
    return out


def greedy_match(ious: np.ndarray, gt_ignore: np.ndarray,
                 iscrowd: np.ndarray, thrs: np.ndarray):
    lib = _load()
    ious = np.ascontiguousarray(ious, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    iscrowd = np.ascontiguousarray(iscrowd, np.uint8)
    thrs = np.ascontiguousarray(thrs, np.float64)
    t, d, g = len(thrs), ious.shape[0], ious.shape[1]
    dtm = np.zeros((t, d), np.int64)
    dt_ig = np.zeros((t, d), np.uint8)
    lib.ait_greedy_match(t, thrs, d, g, ious, gt_ignore, iscrowd, dtm, dt_ig)
    return dtm, dt_ig


def nms_xyxy(boxes: np.ndarray, thresh: float) -> np.ndarray:
    """Keep mask over score-sorted boxes (host-side reference NMS)."""
    lib = _load()
    boxes = np.ascontiguousarray(boxes, np.float64)
    keep = np.zeros(len(boxes), np.uint8)
    if len(boxes):
        lib.ait_nms_xyxy(len(boxes), boxes, float(thresh), keep)
    return keep.astype(bool)
