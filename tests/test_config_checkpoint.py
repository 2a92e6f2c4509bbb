"""Config compatibility + checkpoint round-trip + nan-debugging tests."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ait_tpu.config import Config


def test_reference_yaml_recipes_load_unchanged():
    """The published recipes must load without edits (knob-name parity)."""
    files = sorted(glob.glob("/root/reference/cfgs/*.yml"))
    assert files, "reference cfgs missing"
    for f in files:
        cfg = Config.from_yaml(f)
        assert cfg.POOLING_MODE == "align"
        assert cfg.TRAIN.RPN_POSITIVE_OVERLAP == 0.7


def test_dotted_overrides_and_types():
    cfg = Config()
    cfg = cfg.override(["TRAIN.BATCH_SIZE", "256", "POOLING_MODE", "pool",
                        "ANCHOR_SCALES", "(4, 8, 16, 32)"])
    assert cfg.TRAIN.BATCH_SIZE == 256
    assert cfg.POOLING_MODE == "pool"
    assert cfg.ANCHOR_SCALES == (4, 8, 16, 32)
    with pytest.raises(KeyError):
        cfg.override(["NOT_A_KEY", "1"])
    with pytest.raises(TypeError):
        cfg.override(["TRAIN.BATCH_SIZE", "'abc'"])


def test_checkpoint_roundtrip(tmp_path):
    from ait_tpu.train import TrainState, lr_schedule, make_optimizer
    from ait_tpu.train.checkpoint import CheckpointManager

    cfg = Config()
    params = {"w": jnp.arange(6.0).reshape(2, 3),
              "b": {"bias": jnp.ones(3)}}
    tx = make_optimizer(cfg, lr_schedule(0.01, 10, 4, 0.1))
    state = TrainState.create(params, tx)
    state = state.replace(step=jnp.int32(7))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(7, state, metadata={"epoch": 1})
    mgr.wait()
    assert mgr.latest_step() == 7

    template = TrainState.create(
        jax.tree_util.tree_map(jnp.zeros_like, params), tx)
    restored = mgr.restore(template)
    assert int(restored.step) == 7
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    mgr.close()


@pytest.mark.slow
def test_train_step_clean_under_debug_nans():
    """jax_debug_nans as the nan/race 'sanitizer' CI (SURVEY.md §5)."""
    import dataclasses

    from ait_tpu.models import AITDetector
    from ait_tpu.train import (TrainState, init_params, lr_schedule,
                               make_optimizer, make_train_step)

    cfg = Config()
    cfg = cfg.replace(
        TRAIN=dataclasses.replace(
            cfg.TRAIN, RPN_PRE_NMS_TOP_N=32, RPN_POST_NMS_TOP_N=8,
            RPN_BATCHSIZE=16, BATCH_SIZE=4),
        MAX_NUM_GT_BOXES=3)
    model = AITDetector(cfg)
    rng = np.random.RandomState(0)
    gt = np.zeros((1, 3, 5), np.float32)
    gt[:, 0] = [4, 4, 40, 50, 1]
    batch = {
        "image": jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32),
        "query": jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32),
        "im_info": jnp.asarray([[64, 96, 1.0]], jnp.float32),
        "gt_boxes": jnp.asarray(gt),
        "num_boxes": jnp.ones((1,), jnp.int32),
    }
    params = init_params(model, cfg, jax.random.PRNGKey(0), batch=batch)
    tx = make_optimizer(cfg, lr_schedule(0.01, 10, 4, 0.1))
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx)
    with jax.debug_nans(True):
        state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
