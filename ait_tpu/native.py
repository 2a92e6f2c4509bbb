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
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
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
    lib.ail_prep_targets.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_char_p), _u8p,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _u8p, _u8p,
        _f32p, ctypes.c_int32]
    lib.ail_prep_targets.restype = ctypes.c_int
    try:  # newer .so: fused space-to-depth canvas emit
        lib.ail_prep_targets2.argtypes = [
            ctypes.c_int64, ctypes.POINTER(ctypes.c_char_p), _u8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _u8p,
            ctypes.c_int32, _u8p, _f32p, ctypes.c_int32]
        lib.ail_prep_targets2.restype = ctypes.c_int
    except AttributeError:  # pragma: no cover - stale prebuilt library
        pass
    lib.ail_prep_queries.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_char_p), _f64p, _u8p,
        ctypes.c_int32, _u8p, _u8p, ctypes.c_int32]
    lib.ail_prep_queries.restype = ctypes.c_int
    lib.ail_space_to_depth.argtypes = [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, _u8p, _u8p,
        ctypes.c_int32]
    lib.ail_space_to_depth.restype = ctypes.c_int
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


def _paths_array(paths):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def supports_fused_s2d() -> bool:
    """True iff the loaded .so can emit the s2d layout during canvas
    placement (ail_prep_targets2)."""
    lib = _load()
    return lib is not None and hasattr(lib, "ail_prep_targets2")


def prep_targets(paths, flips, target_size: int, canvas_hw, fill,
                 n_threads: int = 8, s2d: bool = False):
    """Batch decode+flip+scale+canvas (native input pipeline).

    Returns (canvases, info [N,3]f32, failed mask) — canvases are
    [N,H,W,3]u8, or [N,H/2,W/2,12]u8 with `s2d` (fused space-to-depth emit,
    needs `supports_fused_s2d()`).  A failed item (unreadable/unsupported
    file) has info[:,2]==0; callers redo those through the python path.
    """
    lib = _load()
    n = len(paths)
    ch, cw = int(canvas_hw[0]), int(canvas_hw[1])
    info = np.empty((n, 3), np.float32)
    flips = np.ascontiguousarray(flips, np.uint8)
    fill = np.ascontiguousarray(fill, np.uint8)
    if s2d:
        canvases = np.empty((n, ch // 2, cw // 2, 12), np.uint8)
        lib.ail_prep_targets2(n, _paths_array(paths), flips,
                              int(target_size), ch, cw, fill, 1, canvases,
                              info, int(n_threads))
    else:
        canvases = np.empty((n, ch, cw, 3), np.uint8)
        lib.ail_prep_targets(n, _paths_array(paths), flips, int(target_size),
                             ch, cw, fill, canvases, info, int(n_threads))
    return canvases, info, info[:, 2] == 0


def space_to_depth(arr: np.ndarray, n_threads: int = 8) -> np.ndarray:
    """[N, H, W, 3] u8 -> [N, H/2, W/2, 12] u8 (threaded C++; matches
    transforms.space_to_depth exactly)."""
    lib = _load()
    n, h, w, _ = arr.shape
    arr = np.ascontiguousarray(arr)
    out = np.empty((n, h // 2, w // 2, 12), np.uint8)
    lib.ail_space_to_depth(n, h, w, arr, out, int(n_threads))
    return out


def prep_queries(paths, boxes, flips, query_size: int, n_threads: int = 8):
    """Batch query crops: decode + box crop + square pad + resize [+flip].

    Returns (queries [N,qs,qs,3]u8, failed mask).
    """
    lib = _load()
    n = len(paths)
    out = np.empty((n, query_size, query_size, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    boxes = np.ascontiguousarray(boxes, np.float64)
    flips = np.ascontiguousarray(flips, np.uint8)
    lib.ail_prep_queries(n, _paths_array(paths), boxes, flips,
                         int(query_size), out, ok, int(n_threads))
    return out, ok == 0
