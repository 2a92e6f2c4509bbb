"""The res101 / `_ls` (large-scale) recipe path.

The reference's res101_ls recipe trains/evaluates at shortest-side 800
(cfgs/res101_ls.yml: TRAIN/TEST.SCALES [800]) on the resnet101 backbone
(resnet_sys_transformer_sk_dilat.py:358-394).  Our analog is the 800x1088
static canvas (cfgs/res101_ls.yml tpu.image_size) plus an 800-high wide
bucket so high-aspect images keep the unclamped shortest-side-800 scale.

Coverage here:
  * the `_ls` yaml resolves (base canvas, scales, wide bucket),
  * the loader picks the 800-high wide bucket for 2:1 images (the `_ls`
    analog of the 608-canvas deviation fixed in round 3),
  * the eval CLI compiles and runs resnet101 END TO END at the true
    800x1088 canvas (slow; random init — the plumbing and shapes are what's
    under test; numeric parity for res101 is pinned by
    test_e2e_torch_parity.py::test_full_detector_eval_forward_parity[voc101]
    and conversion coverage by test_full_checkpoint_conversion.py).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from fixtures import make_voc_devkit
from test_wide_bucket import _view


def _ls_cfg():
    from ait_tpu.config import Config
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cfgs", "res101_ls.yml")
    return Config.from_yaml(path)


def test_ls_yaml_resolves():
    cfg = _ls_cfg()
    assert cfg.model.backbone == "resnet101"
    assert tuple(cfg.tpu.image_size) == (800, 1088)
    assert tuple(cfg.TEST.SCALES) == (800,)
    assert tuple(map(tuple, cfg.tpu.wide_buckets)) == ((800, 1600),)


def test_ls_wide_bucket_keeps_800_scale(tmp_path):
    """A 2:1 image at the 800 canvas must pick the (800, 1600) bucket and
    keep the reference's exact unclamped shortest-side-800 scale
    (blob.py:56-58 commented-out MAX_SIZE), not get capped at 1088/1600."""
    from ait_tpu.data import OneShotLoader

    view = _view(tmp_path, [(400, 800)])  # 2:1 landscape
    loader = OneShotLoader(view, _ls_cfg(), training=False)
    assert loader._canvas_for(view.records[0]) == (800, 1600)
    batch = next(loader.test_epoch(1, num_workers=1))
    h, w, scale = batch["im_info"][0]
    assert abs(scale - 2.0) < 1e-6, scale  # 800/400, NOT 1088/800
    assert (h, w) == (800, 1600)

    # a ~4:3 image stays on the base canvas
    view43 = _view(tmp_path, [(375, 500)])
    loader43 = OneShotLoader(view43, _ls_cfg(), training=False)
    assert loader43._canvas_for(view43.records[0]) == (800, 1088)


# ---------------------------------------------------------------------------
# slow: the full eval CLI on the real 800x1088 canvas with resnet101
# ---------------------------------------------------------------------------

# two VOC-shaped images (375x500, like the real dataset's typical size) so
# the 800-scale lands on the base canvas: scale 800/375, 800x1067 <= 1088
_LS_FIXTURE = [
    ("000001", 500, 375, [("cat", 60, 40, 300, 280, 0)]),
    ("000002", 500, 375, [("cat", 120, 80, 420, 330, 0),
                          ("aeroplane", 30, 30, 200, 160, 0)]),
]


@pytest.mark.slow
def test_ls_cli_e2e_res101_800_canvas(tmp_path):
    import test_net as cli

    make_voc_devkit(str(tmp_path / "VOCdevkit2007"), fixture=_LS_FIXTURE)
    out_dir = str(tmp_path / "output")
    results = cli.main([
        "--dataset", "pascal_voc", "--net", "res101", "--ls",
        "--data_dir", str(tmp_path), "--seen", "2", "--a", "1",
        "--bs", "1", "--nw", "0",
        "--output_dir", out_dir,
        "--save_dir", str(tmp_path / "models"),
        # keep the REAL canvas/scales from res101_ls.yml; only shrink the
        # proposal counts so the CPU run stays tractable
        "--set",
        "TEST.RPN_PRE_NMS_TOP_N", "512",
        "TEST.RPN_POST_NMS_TOP_N", "64",
    ])
    assert len(results) == 1
    assert np.isfinite(results[0]["mAP"])
