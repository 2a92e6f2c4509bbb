"""shard_map data-parallel step: collective shape, replication, and 1-device
bitwise equivalence with the plain jit step (VERDICT r1 item 2).

On the 8-device CPU mesh the model takes the XLA (non-Pallas) branches; the
real-chip Pallas-under-sharding check lives in tools/tpu_kernel_check.py.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ait_tpu.config import Config
from ait_tpu.models import AITDetector
from ait_tpu.parallel import (make_mesh, make_sharded_train_step, replicate,
                              shard_batch)
from ait_tpu.train import (TrainState, init_params, lr_schedule,
                           make_optimizer, make_train_step)


def tiny_setup(dtype=jnp.float32):
    cfg = Config()
    cfg = cfg.replace(
        TRAIN=dataclasses.replace(
            cfg.TRAIN, RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16,
            RPN_BATCHSIZE=16, BATCH_SIZE=8),
        MAX_NUM_GT_BOXES=4)
    model = AITDetector(cfg, dtype=dtype)
    return cfg, model


def tiny_batch(b, h=96, w=96, g=4, seed=0):
    r = np.random.RandomState(seed)
    gt = np.zeros((b, g, 5), np.float32)
    gt[:, 0] = [8, 8, 60, 60, 1]
    return {
        "image": jnp.asarray(r.rand(b, h, w, 3), jnp.float32),
        "query": jnp.asarray(r.rand(b, 128, 128, 3), jnp.float32),
        "im_info": jnp.tile(jnp.asarray([[h, w, 1.0]], jnp.float32), (b, 1)),
        "gt_boxes": jnp.asarray(gt),
        "num_boxes": jnp.ones((b,), jnp.int32),
    }


def make_state(cfg, model, batch):
    params = init_params(model, cfg, jax.random.PRNGKey(0),
                         batch=jax.tree_util.tree_map(lambda x: x[:1],
                                                      batch))
    tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
    return tx, TrainState.create(params, tx)


@pytest.mark.slow
def test_sharded_step_8dev_no_allgather_and_replicated():
    cfg, model = tiny_setup()
    mesh = make_mesh(8)
    batch = tiny_batch(8)
    tx, state = make_state(cfg, model, batch)
    state = replicate(state, mesh)
    batch = shard_batch(batch, mesh)

    step = jax.jit(make_sharded_train_step(model, tx, mesh))
    compiled = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
    hlo = compiled.as_text()
    # grad/metric reduction must be all-reduce; nothing in a dp shard_map
    # step should all-gather activations (GSPMD's pallas fallback would)
    assert "all-gather" not in hlo, "unexpected all-gather in dp step"
    assert "all-reduce" in hlo, "missing grad all-reduce"

    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params replicated: every device holds identical values
    leaf = new_state.params["rpn"]["conv"]["kernel"]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 8
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    assert int(new_state.step) == 1


@pytest.mark.slow
def test_sharded_step_n1_bitwise_matches_plain_jit():
    """On a 1-device mesh the shard_map step skips the axis fold and must be
    BITWISE identical to jit(make_train_step)."""
    cfg, model = tiny_setup()
    mesh = make_mesh(1)
    batch = tiny_batch(2, seed=1)
    tx, state = make_state(cfg, model, batch)

    rng = jax.random.PRNGKey(7)
    s_plain, m_plain = jax.jit(make_train_step(model, tx))(
        state, batch, rng)
    s_shard, m_shard = jax.jit(make_sharded_train_step(model, tx, mesh))(
        replicate(state, mesh), shard_batch(batch, mesh), rng)

    np.testing.assert_array_equal(np.asarray(m_plain["loss"]),
                                  np.asarray(m_shard["loss"]))
    flat_p = jax.tree_util.tree_leaves(s_plain.params)
    flat_s = jax.tree_util.tree_leaves(s_shard.params)
    for a, b in zip(flat_p, flat_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_sharded_eval_step_matches_per_image_eval():
    """8-way batch-sharded eval == a loop of single-image evals: the local
    shard program IS the b=1 program, so the results must agree to f32
    noise.  (A b=8 single-device eval is NOT the comparison point — XLA
    reduces b=8 and b=1 programs differently and the tiny score
    differences flip NMS keep-ties, legitimately changing some proposal
    slots; the same is true of the reference under DataParallel.)"""
    from ait_tpu.parallel import make_mesh, make_sharded_eval_step, \
        shard_batch
    from ait_tpu.train import make_eval_step

    cfg, model = tiny_setup()
    mesh = make_mesh(8)
    batch = tiny_batch(8)
    _, state = make_state(cfg, model, batch)

    ev1 = jax.jit(make_eval_step(model))
    per_image = [ev1(state.params,
                     jax.tree_util.tree_map(lambda x: x[i:i + 1], batch))
                 for i in range(8)]
    plain = {k: np.concatenate([np.asarray(p[k]) for p in per_image])
             for k in per_image[0]}
    sharded = jax.jit(make_sharded_eval_step(model, mesh))(
        state.params, shard_batch(batch, mesh))
    for k in plain:
        np.testing.assert_allclose(np.asarray(sharded[k]), plain[k],
                                   rtol=2e-5, atol=2e-5, err_msg=k)
