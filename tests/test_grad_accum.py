"""Gradient accumulation: N scanned microbatches == mean of N separate
grads (same rng per microbatch), on the plain and the sharded step.

TPU extension (the reference has no equivalent — its effective batch is
bounded by GPU count); lets a reference-recipe batch train in 1/N the
activation memory.  See ait_tpu/train/state.py::grads_and_metrics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ait_tpu.train import TrainState, lr_schedule, make_optimizer, \
    make_train_step
from ait_tpu.train.state import grads_and_metrics
from tests.test_sharded_step import make_state, tiny_batch, tiny_setup


@pytest.mark.slow
def test_accum_grads_equal_mean_of_microbatch_grads():
    cfg, model = tiny_setup()
    batch = tiny_batch(4)
    _, state = make_state(cfg, model, batch)
    rng = jax.random.PRNGKey(7)

    g2, m2 = jax.jit(lambda p, b, r: grads_and_metrics(model, p, b, r, 2))(
        state.params, batch, rng)

    half = jax.jit(lambda p, b, r: grads_and_metrics(model, p, b, r, 1))
    halves = jax.tree_util.tree_map(
        lambda x: x.reshape((2, 2) + x.shape[1:]), batch)
    gs, ms = [], []
    for i in range(2):
        b_i = jax.tree_util.tree_map(lambda x: x[i], halves)
        # the accum path derives each microbatch's key by folding its index
        g, m = half(state.params, b_i, jax.random.fold_in(rng, i))
        gs.append(g)
        ms.append(m)

    want = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *gs)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g2),
            jax.tree_util.tree_leaves_with_path(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6, err_msg=str(ka))
    np.testing.assert_allclose(
        float(m2["loss"]),
        (float(ms[0]["loss"]) + float(ms[1]["loss"])) / 2, rtol=1e-6)
    # counts SUM over microbatches
    assert float(m2["fg_cnt"]) == float(ms[0]["fg_cnt"]) + \
        float(ms[1]["fg_cnt"])


@pytest.mark.slow
def test_accum_step_runs_and_sharded_accum_compiles():
    cfg, model = tiny_setup()
    batch = tiny_batch(4)
    tx, state = make_state(cfg, model, batch)
    step = jax.jit(make_train_step(model, tx, accum_steps=2))
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1

    from ait_tpu.parallel import (make_mesh, make_sharded_train_step,
                                  replicate, shard_batch)
    mesh = make_mesh(2)
    batch8 = tiny_batch(8)  # 2 shards x 2 microbatches x 2 images
    tx2, state2 = make_state(cfg, model, batch8)
    state2 = replicate(state2, mesh)
    sstep = jax.jit(make_sharded_train_step(model, tx2, mesh,
                                            accum_steps=2))
    state2, m2 = sstep(state2, shard_batch(batch8, mesh),
                       jax.random.PRNGKey(0))
    assert np.isfinite(float(m2["loss"]))
