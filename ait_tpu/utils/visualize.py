"""Detection visualization (the reference's vis path).

`draw_detections` mirrors `vis_detections` (lib/model/utils/net_utils.py:
50-65: green boxes + score text above a threshold); `compose_with_query`
mirrors the test CLI's side-by-side query inset (test_net_voc.py:475-489:
un-normalize the query tensor, resize to image height, concatenate).
"""

from __future__ import annotations

import numpy as np

from ait_tpu.data.transforms import TORCHVISION_MEAN, TORCHVISION_STD


def draw_detections(image: np.ndarray, dets: np.ndarray,
                    thresh: float = 0.8, label: str = "shot") -> np.ndarray:
    """image: [H, W, 3] uint8 (RGB); dets: [N, 5] x1,y1,x2,y2,score."""
    import cv2

    im = np.ascontiguousarray(image.copy())
    for d in np.asarray(dets).reshape(-1, 5):
        if d[4] <= thresh:
            continue
        p1 = (int(d[0]), int(d[1]))
        p2 = (int(d[2]), int(d[3]))
        cv2.rectangle(im, p1, p2, (0, 204, 0), 2)
        cv2.putText(im, f"{label}: {d[4]:.3f}",
                    (p1[0], max(p1[1] - 2, 10)), cv2.FONT_HERSHEY_PLAIN,
                    1.0, (0, 0, 255), thickness=1)
    return im


def denormalize_query(query: np.ndarray) -> np.ndarray:
    """[128, 128, 3] normalized floats (or raw uint8) -> uint8 RGB."""
    if query.dtype == np.uint8:
        return query
    q = query * TORCHVISION_STD + TORCHVISION_MEAN
    return np.clip(q * 255.0, 0, 255).astype(np.uint8)


def compose_with_query(image: np.ndarray, query: np.ndarray) -> np.ndarray:
    """Side-by-side target image + query patch resized to image height."""
    import cv2

    h = image.shape[0]
    q = cv2.resize(denormalize_query(query), (h, h),
                   interpolation=cv2.INTER_LINEAR)
    return np.concatenate([image, q], axis=1)
