"""Portrait canvas bucket: tall images keep full resolution, batches stay
canvas-homogeneous (the TPU analog of the reference's aspect grouping)."""

import sys

import numpy as np

from ait_tpu.config import Config
from ait_tpu.data import OneShotLoader
from ait_tpu.data.voc import filter_seen, load_voc

sys.path.insert(0, "tests")
from fixtures import make_voc_devkit  # noqa: E402

# one clearly-portrait image (000003 is 90x110 already) + landscape ones
PORTRAIT_FIXTURE = [
    ("000001", 100, 80, [("cat", 10, 10, 60, 70, 0)]),
    ("000002", 80, 160, [("cow", 5, 5, 50, 100, 0)]),   # tall
    ("000003", 120, 90, [("sheep", 12, 15, 70, 80, 0)]),
    ("000004", 70, 150, [("cat", 8, 8, 55, 120, 0)]),   # tall
]


def make_view(tmp_path, cfg):
    devkit = make_voc_devkit(str(tmp_path / "VOCdevkit2007"),
                             fixture=PORTRAIT_FIXTURE)
    return filter_seen(load_voc(devkit, "2007", "test"), 2)


def _no_wide(cfg):
    """Pin wide_buckets off: these tests isolate the portrait-transpose
    mechanism; the wide-bucket interplay is tested in test_wide_bucket.py."""
    import dataclasses

    return cfg.replace(tpu=dataclasses.replace(cfg.tpu, wide_buckets=()))


def test_portrait_canvas_and_resolution(tmp_path):
    cfg = _no_wide(Config())
    assert cfg.tpu.portrait_bucket
    view = make_view(tmp_path, cfg)
    loader = OneShotLoader(view, cfg, training=False)
    h, w = cfg.tpu.image_size
    if loader.host_s2d:      # uint8 images ship as [H/2, W/2, 12]
        h, w = h // 2, w // 2
    shapes = set()
    infos = {}
    for batch in loader.test_epoch(2, num_workers=1):
        shapes.add(batch["image"].shape[1:3])
        # batch is canvas-homogeneous
        for i in range(len(batch["pair_index"])):
            infos[int(batch["pair_index"][i])] = batch["im_info"][i]
    assert shapes == {(h, w), (w, h)}
    # the tall image (record 1: 80x160, a 1:2 extreme the reference would
    # crop) fits the portrait canvas at scale 800/160 = 5.0 — better than
    # the landscape-canvas fit of 608/160 = 3.8
    tall_pair = [i for i, (r, c) in enumerate(loader.pairs) if r == 1][0]
    assert abs(float(infos[tall_pair][2]) - 800.0 / 160.0) < 1e-6


def test_landscape_only_without_bucket(tmp_path):
    import dataclasses

    cfg = _no_wide(Config())
    cfg = cfg.replace(tpu=dataclasses.replace(cfg.tpu,
                                              portrait_bucket=False))
    view = make_view(tmp_path, cfg)
    loader = OneShotLoader(view, cfg, training=False)
    shapes = {batch["image"].shape[1:3]
              for batch in loader.test_epoch(2, num_workers=1)}
    ch, cw = cfg.tpu.image_size
    expect = (ch // 2, cw // 2) if loader.host_s2d else (ch, cw)
    assert shapes == {expect}


def test_train_batches_homogeneous(tmp_path):
    cfg = _no_wide(Config())
    view = make_view(tmp_path, cfg)
    loader = OneShotLoader(view, cfg, training=True, seed=0)
    shapes = [batch["image"].shape[1:3]
              for batch in loader.train_epoch(2, num_workers=1)]
    h, w = cfg.tpu.image_size
    if loader.host_s2d:
        h, w = h // 2, w // 2
    assert set(shapes) == {(h, w), (w, h)}
    # every record seen at least once per epoch (wrap-padded per group)
    assert len(shapes) >= len(view.records) // 2
