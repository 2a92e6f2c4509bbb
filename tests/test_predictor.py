"""OneShotPredictor API smoke (tiny config, CPU)."""

import pytest
import dataclasses

import numpy as np

from ait_tpu.config import Config
from ait_tpu.predict import OneShotPredictor, _config_from_json

pytestmark = pytest.mark.slow  # >30s: heavy compile / torch parity


def test_predict_smoke():
    cfg = Config()
    cfg = cfg.replace(
        TEST=dataclasses.replace(cfg.TEST, RPN_PRE_NMS_TOP_N=64,
                                 RPN_POST_NMS_TOP_N=16),
        tpu=dataclasses.replace(cfg.tpu, image_size=(160, 224)),
    )
    import jax
    from ait_tpu.models import AITDetector
    from ait_tpu.train import init_params

    params = init_params(AITDetector(cfg), cfg, jax.random.PRNGKey(0))
    pred = OneShotPredictor(cfg, params)

    rng = np.random.RandomState(0)
    image = (rng.rand(240, 320, 3) * 255).astype(np.uint8)
    qimg = (rng.rand(200, 200, 3) * 255).astype(np.uint8)
    dets = pred.predict(image, qimg, (20, 20, 120, 140))
    assert dets.ndim == 2 and dets.shape[1] == 5
    if len(dets):
        assert dets[:, 4].min() >= 0 and dets[:, 4].max() <= 1
        # coordinates are in original image space
        assert dets[:, 2].max() <= 320 and dets[:, 3].max() <= 240
    outs = pred.predict_batch([
        (image, qimg, (20, 20, 120, 140)),
        (image, qimg, (5, 5, 60, 60)),
    ])
    assert len(outs) == 2


def test_config_json_roundtrip(tmp_path):
    import json

    from ait_tpu.train.checkpoint import save_config

    cfg = Config().override(["TRAIN.BATCH_SIZE", "64",
                             "ANCHOR_SCALES", "(4, 8, 16, 32)"])
    save_config(str(tmp_path), cfg)
    doc = json.load(open(tmp_path / "config.json"))
    back = _config_from_json(doc)
    assert back.TRAIN.BATCH_SIZE == 64
    assert back.ANCHOR_SCALES == (4, 8, 16, 32)
    assert back.tpu.image_size == cfg.tpu.image_size
