"""Wide canvas buckets (cfg.tpu.wide_buckets): high-aspect images keep the
reference's exact unclamped shortest-side scale (blob.py:56-58) instead of
being downscaled to fit the base canvas."""

import imageio.v2 as imageio
import numpy as np

from ait_tpu.config import Config
from ait_tpu.data import OneShotLoader
from ait_tpu.data.records import DatasetView, ImageRecord, QueryExemplar


def _view(tmp_path, dims):
    recs, cat_data = [], {1: []}
    for i, (h, w) in enumerate(dims):
        path = str(tmp_path / f"im{i}.png")
        rng = np.random.RandomState(i)
        imageio.imwrite(path, rng.randint(0, 255, (h, w, 3), np.uint8))
        box = np.array([[4.0, 4.0, w - 5.0, h - 5.0]], np.float32)
        recs.append(ImageRecord(i, path, w, h, box,
                                np.array([1], np.int32),
                                np.zeros(1, np.int32)))
        cat_data[1].append(QueryExemplar(path, box[0]))
    view = DatasetView("wide", ("__background__", "a"), recs, cat_data)
    view.allowed_classes = [1]
    return view


def _cfg(wide):
    return Config().override([
        "tpu.image_size", "(128, 160)",
        "tpu.wide_buckets", repr(wide),
        "tpu.portrait_bucket", "True",
        "TRAIN.SCALES", "(100,)",
        "TEST.SCALES", "(100,)",
        "MAX_NUM_GT_BOXES", "4",
    ])


def test_wide_image_keeps_reference_scale(tmp_path):
    """A 2:1 image must evaluate at scale target/shortest-side (1.0 here),
    exactly like the reference's unclamped resize — on the wide canvas."""
    view = _view(tmp_path, [(100, 200)])
    loader = OneShotLoader(view, _cfg(((128, 256),)), training=False)
    assert loader._canvas_for(view.records[0]) == (128, 256)
    batch = next(loader.test_epoch(1, num_workers=1))
    assert batch["image"].shape[1:3] == (64, 128)  # s2d of (128, 256)
    h, w, scale = batch["im_info"][0]
    assert scale == 1.0, scale  # NOT capped to 160/200
    assert (h, w) == (100, 200)

    # without the bucket the old capped behavior remains
    loader0 = OneShotLoader(_view(tmp_path, [(100, 200)]), _cfg(()),
                            training=False)
    assert loader0._canvas_for(loader0.view.records[0]) == (128, 160)
    b0 = next(loader0.test_epoch(1, num_workers=1))
    assert abs(b0["im_info"][0][2] - 0.8) < 1e-6  # capped: 160/200


def test_portrait_wide_image_uses_transposed_bucket(tmp_path):
    view = _view(tmp_path, [(200, 100)])  # 1:2 tall
    loader = OneShotLoader(view, _cfg(((128, 256),)), training=False)
    assert loader._canvas_for(view.records[0]) == (256, 128)


def test_mismatched_bucket_height_is_ignored(tmp_path):
    """A bucket whose height differs from the base canvas cannot share the
    600-scale height and is skipped (guards tiny-canvas experiments against
    the production default bucket)."""
    view = _view(tmp_path, [(100, 200)])
    loader = OneShotLoader(view, _cfg(((608, 1216),)), training=False)
    assert loader._canvas_for(view.records[0]) == (128, 160)


def test_batches_group_by_canvas(tmp_path):
    """Mixed normal/wide/portrait records split into canvas-homogeneous
    batches covering every record."""
    dims = [(100, 120), (100, 210), (100, 115), (100, 205),
            (210, 100), (120, 100)]
    view = _view(tmp_path, dims)
    loader = OneShotLoader(view, _cfg(((128, 256),)), training=False)
    seen = []
    shapes = set()
    for batch in loader.test_epoch(2, num_workers=1):
        s2d_hw = batch["image"].shape[1:3]
        shapes.add(s2d_hw)
        seen.extend(batch["pair_index"].tolist())
    assert set(seen) == set(range(len(dims)))
    assert shapes == {(64, 80), (64, 128), (128, 64), (80, 64)}


def test_extreme_aspect_falls_back_to_widest_bucket(tmp_path):
    """Beyond the widest bucket the scale is capped there (3:1 image on a
    2:1 bucket -> scale 256/300)."""
    view = _view(tmp_path, [(100, 300)])
    loader = OneShotLoader(view, _cfg(((128, 256),)), training=False)
    assert loader._canvas_for(view.records[0]) == (128, 256)
    batch = next(loader.test_epoch(1, num_workers=1))
    assert abs(batch["im_info"][0][2] - 256.0 / 300.0) < 1e-6
