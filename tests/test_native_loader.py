"""Native (C++) input pipeline vs the pure-python loader.

The native path must produce bit-identical metadata (same rng draw order)
and pixels within 1 LSB (float bilinear vs cv2's /2048 fixed point), and
fall back to imageio per item for formats libjpeg/libpng can't decode.
"""

import os
import tempfile

import numpy as np
import pytest

from ait_tpu import native
from ait_tpu.config import Config
from ait_tpu.data import OneShotLoader

from tools.overfit_smoke import make_dataset

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native/libait_native.so not built")


def _loaders(training=True, n_images=24):
    root = tempfile.mkdtemp(prefix="nat_")
    cfg = Config()
    assert cfg.tpu.input_uint8
    lp = OneShotLoader(make_dataset(root, n_images=n_images), cfg,
                       training=training, seed=0)
    ln = OneShotLoader(make_dataset(root, n_images=n_images), cfg,
                       training=training, seed=0)
    assert ln._use_native()
    return lp, ln


def _compare(bp, bn):
    for k in bp:
        a, b = bp[k], bn[k]
        if a.dtype == np.uint8:
            d = np.abs(a.astype(int) - b.astype(int))
            assert d.max() <= 1, (k, d.max())
        else:
            np.testing.assert_array_equal(a, b, err_msg=k)


def test_train_batch_matches_python():
    lp, ln = _loaders(training=True)
    idxs = list(range(8))
    bp = lp._collate([lp.train_item(i) for i in idxs])
    bn = ln._train_batch_native(idxs, 2)
    _compare(bp, bn)


def test_test_batch_matches_python():
    lp, ln = _loaders(training=False)
    idxs = list(range(min(8, len(ln))))
    bp = lp._collate([lp.test_item(i) for i in idxs])
    bn = ln._test_batch_native(idxs, 2)
    _compare(bp, bn)


def test_epoch_stream_matches_python():
    lp, ln = _loaders(training=True)
    for bp, bn in zip(lp.train_epoch(4, num_workers=2),
                      ln.train_epoch(4, num_workers=2)):
        _compare(bp, bn)


def test_fused_s2d_emit_bitwise_matches_separate_pass():
    """ail_prep_targets2(s2d=1) == ail_prep_targets + ail_space_to_depth."""
    assert native.supports_fused_s2d()
    _, ln = _loaders(training=True)
    recs = ln.view.records[:6]
    paths = [r.image_path for r in recs]
    flips = np.array([r.flipped for r in recs], np.uint8)
    fill = np.array([124, 116, 104], np.uint8)
    canvas = ln.canvas
    plain, info_a, bad_a = native.prep_targets(
        paths, flips, 600, canvas, fill, 2, s2d=False)
    fused, info_b, bad_b = native.prep_targets(
        paths, flips, 600, canvas, fill, 2, s2d=True)
    assert not bad_a.any() and not bad_b.any()
    np.testing.assert_array_equal(info_a, info_b)
    np.testing.assert_array_equal(native.space_to_depth(plain, 2), fused)


def test_unsupported_format_falls_back():
    import dataclasses
    import imageio.v2 as imageio
    lp, ln = _loaders(training=True)
    # rewrite one image as BMP (not decodable by libjpeg/libpng)
    rec = ln.view.records[0]
    im = imageio.imread(rec.image_path)
    bmp = os.path.splitext(rec.image_path)[0] + ".bmp"
    imageio.imwrite(bmp, im)
    lp.view.records[0] = dataclasses.replace(
        lp.view.records[0], image_path=bmp)
    ln.view.records[0] = dataclasses.replace(
        ln.view.records[0], image_path=bmp)
    bp = lp._collate([lp.train_item(0)])
    bn = ln._train_batch_native([0], 1)
    _compare(bp, bn)


def test_dim_mismatched_record_agrees_with_python():
    """Annotation dims != decoded dims: the python path scales gt by the
    DECODED scale; the native path must rescale to match (round-1 weak #6
    — it used to trust the annotation dims)."""
    import dataclasses
    lp, ln = _loaders(training=True)
    for loader in (lp, ln):
        rec = loader.view.records[0]
        # lie about the stored dims: half the real size
        loader.view.records[0] = dataclasses.replace(
            rec, width=rec.width // 2, height=rec.height // 2)
    bp = lp._collate([lp.train_item(0)])
    bn = ln._train_batch_native([0], 1)
    assert bp["num_boxes"][0] > 0
    np.testing.assert_array_equal(bp["gt_boxes"], bn["gt_boxes"])
    np.testing.assert_array_equal(bp["im_info"], bn["im_info"])
