"""Train step on a virtual 8-device CPU mesh: the multi-chip path the
reference never had (its only parallelism was nn.DataParallel,
trainval_net_voc.py:321-326)."""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ait_tpu.config import Config
from ait_tpu.models import AITDetector
from ait_tpu.parallel import make_mesh, replicate, shard_batch
from ait_tpu.train import (TrainState, init_params, lr_schedule,
                           make_optimizer, make_param_labels, make_train_step)

pytestmark = pytest.mark.slow  # >30s: heavy compile / torch parity


def tiny_cfg():
    cfg = Config()
    return cfg.replace(
        TRAIN=dataclasses.replace(
            cfg.TRAIN, RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16,
            RPN_BATCHSIZE=16, BATCH_SIZE=8),
        MAX_NUM_GT_BOXES=4,
    )


def tiny_batch(b=8, h=96, w=128):
    rng = np.random.RandomState(1)
    gt = np.zeros((b, 4, 5), np.float32)
    gt[:, 0] = [8, 8, 50, 70, 1]
    gt[:, 1] = [30, 16, 90, 80, 0]
    return {
        "image": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "query": jnp.asarray(rng.rand(b, 128, 128, 3), jnp.float32),
        "im_info": jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1)),
        "gt_boxes": jnp.asarray(gt),
        "num_boxes": jnp.full((b,), 2, jnp.int32),
    }


def test_param_labels():
    cfg = tiny_cfg()
    model = AITDetector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0),
                         batch=tiny_batch(b=1))
    labels = make_param_labels(params)
    flat = {jax.tree_util.keystr(p): v
            for p, v in jax.tree_util.tree_flatten_with_path(labels)[0]}
    assert flat["['backbone']['conv1']['kernel']"] == "frozen"
    assert flat["['backbone']['bn1']['mean']"] == "frozen"
    assert flat["['backbone']['bn1']['scale']"] == "frozen"
    assert flat["['backbone']['layer1']['block0']['conv1']['kernel']"] == "weight"
    assert flat["['backbone']['layer1']['block0']['bn1']['scale']"] == "frozen"
    assert flat["['bbox_pred_head']['bias']"] == "bias"
    assert flat["['bbox_pred_head']['kernel']"] == "weight"


def test_data_parallel_train_step():
    cfg = tiny_cfg()
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    model = AITDetector(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(0),
                         batch=tiny_batch(b=1))
    tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
    state = TrainState.create(params, tx)

    state = replicate(state, mesh)
    batch = shard_batch(tiny_batch(b=8), mesh)

    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    rng = jax.random.PRNGKey(42)

    frozen_before = np.asarray(state.params["backbone"]["bn1"]["mean"])
    conv1_before = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    w_before = np.asarray(
        state.params["backbone"]["layer2"]["block0"]["conv1"]["kernel"])

    losses = []
    for _ in range(2):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["loss"]))

    assert all(np.isfinite(losses))
    assert int(state.step) == 2
    # frozen leaves untouched, trainable weights moved
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["bn1"]["mean"]), frozen_before)
    np.testing.assert_array_equal(
        np.asarray(state.params["backbone"]["conv1"]["kernel"]), conv1_before)
    assert np.any(
        np.asarray(state.params["backbone"]["layer2"]["block0"]["conv1"]
                   ["kernel"]) != w_before)
    # fg/bg counts fill the ROI batch exactly
    assert int(metrics["fg_cnt"]) + int(metrics["bg_cnt"]) == \
        8 * cfg.TRAIN.BATCH_SIZE
