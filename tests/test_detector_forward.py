"""End-to-end detector forward smoke tests (tiny shapes, CPU).

The closest thing the reference has is `adaptive_image_transformer.py:52-56`
(shape check of the AIT module on random tensors); here the whole detector is
exercised in both train and eval mode.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ait_tpu.config import Config
from ait_tpu.models import AITDetector

pytestmark = pytest.mark.slow  # >30s: heavy compile / torch parity


def tiny_cfg(**model_kw):
    cfg = Config()
    cfg = cfg.replace(
        TRAIN=dataclasses.replace(cfg.TRAIN, 
            RPN_PRE_NMS_TOP_N=128, RPN_POST_NMS_TOP_N=32,
            RPN_BATCHSIZE=32, BATCH_SIZE=8),
        TEST=dataclasses.replace(cfg.TEST, RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16),
        MAX_NUM_GT_BOXES=5,
    )
    if model_kw:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))
    return cfg


def tiny_batch(rng, b=2, h=128, w=160, q=128, g=5):
    image = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    query = jnp.asarray(rng.rand(b, q, q, 3), jnp.float32)
    im_info = jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1))
    gt = np.zeros((b, g, 5), np.float32)
    gt[:, 0] = [10, 10, 60, 80, 1]
    gt[:, 1] = [40, 20, 100, 90, 0]
    num_boxes = jnp.full((b,), 2, jnp.int32)
    return image, query, im_info, jnp.asarray(gt), num_boxes


@pytest.fixture(scope="module")
def batch():
    return tiny_batch(np.random.RandomState(0))


def init_and_run(cfg, batch, train):
    model = AITDetector(cfg)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "sampling": jax.random.PRNGKey(2)}
    variables = model.init(rngs, *batch, train=train)
    out = model.apply(
        variables, *batch, train=train,
        rngs={"dropout": jax.random.PRNGKey(3),
              "sampling": jax.random.PRNGKey(4)} if train else None)
    return out


def test_train_forward(batch):
    cfg = tiny_cfg()
    out = init_and_run(cfg, batch, train=True)
    b, r = 2, cfg.TRAIN.BATCH_SIZE
    assert out.rois.shape == (b, r, 5)
    assert out.cls_prob.shape == (b, r, 1)
    assert out.bbox_pred.shape == (b, r, 4)
    assert out.rois_label.shape == (b, r)
    for name in ("rpn_loss_cls", "rpn_loss_box", "rcnn_loss_cls",
                 "margin_loss", "rcnn_loss_bbox"):
        val = getattr(out, name)
        assert np.isfinite(float(val)), name
    assert float(out.total_loss) > 0
    # sampled rois carry their batch index in col 0
    np.testing.assert_array_equal(np.asarray(out.rois[..., 0]),
                                  np.tile([[0], [1]], (1, r)))


def test_eval_forward(batch):
    cfg = tiny_cfg(coattention="nonlocal")
    out = init_and_run(cfg, batch, train=False)
    b, r = 2, cfg.TEST.RPN_POST_NMS_TOP_N
    assert out.rois.shape == (b, r, 5)
    assert out.cls_prob.shape == (b, r, 1)
    assert np.all(np.asarray(out.cls_prob) >= 0)
    assert np.all(np.asarray(out.cls_prob) <= 1)
    assert float(out.total_loss) == 0.0


def test_train_forward_contextual_relation(batch):
    """with_contextual_relation=True threads a query-derived channel scale
    through both head streams (faster_rcnn_sys…:256-265)."""
    cfg = tiny_cfg(with_contextual_relation=True, rnn_method="LSTM")
    out = init_and_run(cfg, batch, train=True)
    assert np.isfinite(float(out.total_loss))
    assert float(out.total_loss) > 0
