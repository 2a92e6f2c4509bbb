"""Host-side image preparation, pinned to the reference's blob helpers.

* `prep_image` — /255, torchvision mean/std normalize (the reference hardcodes
  these and ignores its own `cfg.PIXEL_MEANS` argument, blob.py:42-48), then
  shortest-side scale to `target_size` with NO max-size clamp (blob.py:56-58
  commented out), cv2 INTER_LINEAR.
* `crop_query` — cut the query box, center-pad to square, resize to
  query_size x query_size (blob.py:65-99).
* `place_on_canvas` — the TPU static-shape addition: after scaling, images are
  placed top-left on a fixed zero canvas; if the scaled image would overflow
  the canvas the scale is reduced to fit.  The reference instead pads each
  *batch* to its own max shape (im_list_to_blob, blob.py:20-32) which yields a
  different shape per batch — incompatible with one compiled program.
"""

from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np

TORCHVISION_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
TORCHVISION_STD = np.array([0.229, 0.224, 0.225], np.float32)


def to_rgb3(im: np.ndarray) -> np.ndarray:
    if im.ndim == 2:
        im = np.repeat(im[:, :, None], 3, axis=2)
    if im.shape[2] == 4:  # RGBA
        im = im[:, :, :3]
    return im


def normalize(im: np.ndarray) -> np.ndarray:
    im = im.astype(np.float32) / 255.0
    return (im - TORCHVISION_MEAN) / TORCHVISION_STD


def prep_image(im: np.ndarray, target_size: int,
               max_hw: Tuple[int, int] | None = None,
               keep_uint8: bool = False) -> Tuple[np.ndarray, float]:
    """Shortest-side scale (optionally capped to fit max_hw) + normalize.

    keep_uint8 resizes the raw uint8 image and skips normalization — the
    device does `(x/255 - mean)/std` instead (4x less host->device traffic;
    differs from the reference's normalize-then-resize by sub-LSB rounding).
    """
    im = to_rgb3(im)
    if not keep_uint8:
        im = normalize(im)
    h, w = im.shape[:2]
    scale = float(target_size) / min(h, w)
    if max_hw is not None:
        scale = min(scale, max_hw[0] / h, max_hw[1] / w)
    im = cv2.resize(im, None, None, fx=scale, fy=scale,
                    interpolation=cv2.INTER_LINEAR)
    return im, scale


def crop_query(image: np.ndarray, box, query_size: int) -> np.ndarray:
    """Cut `box` (x1,y1,x2,y2), center-pad square, resize (blob.py:65-99)."""
    image = to_rgb3(image)
    cut = image[int(box[1]):int(box[3]), int(box[0]):int(box[2]), :]
    h, w = cut.shape[:2]
    if h == 0 or w == 0:
        cut = np.zeros((1, 1, 3), image.dtype)
        h = w = 1
    m = max(h, w)
    cty, ctx = h // 2, w // 2
    sq = np.zeros((m, m, 3), cut.dtype)
    x0, x1 = max(0, ctx - m // 2), min(ctx + m // 2, w)
    y0, y1 = max(0, cty - m // 2), min(cty + m // 2, h)
    ys = slice(m // 2 - (cty - y0), m // 2 + (y1 - cty))
    xs = slice(m // 2 - (ctx - x0), m // 2 + (x1 - ctx))
    sq[ys, xs, :] = cut[y0:y1, x0:x1, :]
    return cv2.resize(sq, (query_size, query_size),
                      interpolation=cv2.INTER_LINEAR)


def place_on_canvas(im: np.ndarray, canvas_hw: Tuple[int, int]) -> np.ndarray:
    """Top-left placement on a canvas that normalizes to ~zero.

    The reference pads batches with zeros in NORMALIZED space
    (im_list_to_blob, blob.py:27-31); a uint8 canvas therefore pads with the
    mean pixel value so the device-side normalize maps the padding to ~0.
    """
    if im.dtype == np.uint8:
        fill = np.round(TORCHVISION_MEAN * 255.0).astype(np.uint8)
        out = np.empty((canvas_hw[0], canvas_hw[1], 3), np.uint8)
        out[:] = fill
    else:
        out = np.zeros((canvas_hw[0], canvas_hw[1], 3), np.float32)
    h = min(im.shape[0], canvas_hw[0])
    w = min(im.shape[1], canvas_hw[1])
    out[:h, :w, :] = im[:h, :w, :]
    return out


def space_to_depth(arr: np.ndarray) -> np.ndarray:
    """[..., H, W, 3] -> [..., H/2, W/2, 12] (channel = dy*6 + dx*3 + c).

    The exact regroup the resnet stem rewrite performs on device
    (models/resnet.py s2d_stem); doing it on the host removes the
    device-side reshape + layout copy from the step."""
    *lead, h, w, c = arr.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    out = arr.reshape(*lead, h // 2, 2, w // 2, 2, c)
    nd = out.ndim
    # [..., h2, 2, w2, 2, c] -> [..., h2, w2, 2, 2, c]
    perm = tuple(range(nd - 5)) + (nd - 5, nd - 3, nd - 4, nd - 2, nd - 1)
    return np.ascontiguousarray(out.transpose(perm)).reshape(
        *lead, h // 2, w // 2, 4 * c)
