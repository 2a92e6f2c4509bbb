"""Shot-fused eval step (train.make_fused_eval_step): exactness gates.

The fused step batches U unique images x A query shots and gathers the
image backbone's features to the U*A pair rows.  Exactness structure:

  * at A=1 the fused program computes the identical math (the gather is
    an identity take) — bitwise equal on a single-device CPU backend;
    under the test env's 8 virtual devices XLA fuses the two HLO graphs
    differently and the outputs drift at the ~1e-5 tiling level, so the
    gates here are tight-allclose;
  * at A>1, row u*A+0 matches the separate pass at query_position 0 to
    the same tolerance;
  * other rows can additionally differ by near-tie proposal flips: the
    tail runs at pair batch U*A instead of U, and the drift is enough to
    flip a random-init model's tie-packed NMS orderings (same effect
    documented for the cross-framework coco gate).  With trained weights
    the score spread is orders of magnitude above the drift.

This file pins the two tight-equality properties plus the query-shot
selection; tools/test_net.py --fuse_shots
end-to-end equivalence is gated (tie-tolerantly) in test_cli_eval.py.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from fixtures import make_voc_devkit

pytestmark = pytest.mark.slow  # full-detector compiles


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    import jax

    from ait_tpu.config import Config
    from ait_tpu.data import OneShotLoader
    from ait_tpu.data import voc as voc_data
    from ait_tpu.models import AITDetector
    from ait_tpu.train import (init_params, make_eval_step,
                               make_fused_eval_step)

    tmp = tmp_path_factory.mktemp("fused")
    make_voc_devkit(str(tmp / "VOCdevkit2007"))
    cfg = Config().override([
        "tpu.image_size", "(128, 160)", "tpu.portrait_bucket", "False",
        "TEST.SCALES", "(100,)", "TEST.RPN_PRE_NMS_TOP_N", "256",
        "TEST.RPN_POST_NMS_TOP_N", "32",
    ])
    view = voc_data.filter_seen(
        voc_data.load_voc(str(tmp / "VOCdevkit2007"), "2007", "test"), 2)
    loader = OneShotLoader(view, cfg, training=False)
    model = AITDetector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0))
    return (loader, params, jax.jit(make_eval_step(model)),
            jax.jit(make_fused_eval_step(model)))


def _sep(loader, es, params, pair, qpos):
    loader.query_position = qpos
    it = loader.test_item(pair)
    b = {k: np.asarray(v)[None] for k, v in it.items()}
    return es(params, {k: b[k] for k in ("image", "query", "im_info",
                                         "gt_boxes", "num_boxes")})


def _fused(loader, fs, params, pair, shots):
    it = loader.fused_item(pair, shots)
    b = {k: np.asarray(v)[None] for k, v in it.items()}
    return fs(params, {k: b[k] for k in ("image", "query", "im_info",
                                         "gt_boxes")})


TOL = {"rois": 1e-3, "cls_prob": 1e-4, "bbox_pred": 1e-4}


def test_fused_a1_equals_plain(setup):
    loader, params, es, fs = setup
    out = _sep(loader, es, params, 0, 0)
    fout = _fused(loader, fs, params, 0, 1)
    for k, atol in TOL.items():
        np.testing.assert_allclose(np.asarray(out[k]),
                                   np.asarray(fout[k]), atol=atol,
                                   err_msg=k)


def test_fused_row0_equals_shot0(setup):
    loader, params, es, fs = setup
    out = _sep(loader, es, params, 1, 0)
    fout = _fused(loader, fs, params, 1, 2)
    for k, atol in TOL.items():
        np.testing.assert_allclose(
            np.asarray(out[k])[0], np.asarray(fout[k])[0], atol=atol,
            err_msg=k)


def test_fused_queries_match_all_shots(setup):
    """fused_item's stacked queries reproduce test_item's seed-by-img-id
    selection at every query_position."""
    loader, *_ = setup
    for pair in range(min(3, len(loader.pairs))):
        fit = loader.fused_item(pair, 3)
        for a in range(3):
            loader.query_position = a
            it = loader.test_item(pair)
            np.testing.assert_array_equal(fit["query"][a], it["query"])
            np.testing.assert_array_equal(fit["image"], it["image"])
