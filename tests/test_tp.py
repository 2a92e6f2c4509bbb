"""Tensor parallelism (cfg.tpu.tp_size > 1, 'model' mesh axis).

Head-sharded attention + Megatron FFN (models/attention.py) and the matching
block-sparse grad psum (parallel/tp.py), checked against the replicated
(tp=1) computation on the virtual CPU mesh:

  * AITTransformer forward under tp=2 == plain forward (unit-level, no NMS
    discreteness in the way);
  * grads of a scalar loss through the transformer, after tp_psum_grads,
    == plain grads for EVERY param leaf — this pins the psum/no-op leaf
    classification in parallel/tp.py exactly;
  * the full detector train step on a (data=2, model=2) mesh matches the
    dp-only (data=2) step (dropout off), and runs finite with dropout on.
"""

import dataclasses
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ait_tpu.config import Config
from ait_tpu.models import AITDetector
from ait_tpu.models.ait_transformer import AITTransformer
from ait_tpu.parallel import (make_mesh, make_sharded_train_step, replicate,
                              shard_batch)
from ait_tpu.parallel.sharded import shard_map
from ait_tpu.parallel.tp import tp_psum_grads
from tests.test_sharded_step import make_state, tiny_batch, tiny_setup

TP = 2


def _transformer(tp_size):
    return AITTransformer(n_layers=1, dropout=0.1, channels=64,
                          d_word_vec=32, d_model=32, d_inner=64, n_head=4,
                          d_k=8, d_v=8, n_position=16,
                          tp_size=tp_size, tp_axis="model")


@functools.lru_cache()
def _transformer_fixture():
    r = np.random.RandomState(0)
    props = jnp.asarray(r.randn(4, 3, 3, 64), jnp.float32)  # 2 props x 2 imgs
    query = jnp.asarray(r.randn(2, 4, 4, 64), jnp.float32)
    params = _transformer(1).init(jax.random.PRNGKey(0), props, query)[
        "params"]
    return params, props, query


@pytest.mark.slow
def test_tp_transformer_forward_matches_replicated():
    params, props, query = _transformer_fixture()
    ref = _transformer(1).apply({"params": params}, props, query,
                                deterministic=True)

    mesh = make_mesh(TP, axes=("model",))
    tp_fwd = shard_map(
        lambda p, a, b: _transformer(TP).apply({"params": p}, a, b,
                                               deterministic=True),
        mesh, in_specs=(P(), P(), P()), out_specs=P())
    out = jax.jit(tp_fwd)(params, props, query)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_tp_grads_match_replicated_every_leaf():
    params, props, query = _transformer_fixture()

    def loss_1(p):
        out = _transformer(1).apply({"params": p}, props, query,
                                    deterministic=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    ref_grads = jax.jit(jax.grad(loss_1))(params)

    mesh = make_mesh(TP, axes=("model",))

    def local_grads(p, a, b):
        def loss_tp(p):
            out = _transformer(TP).apply({"params": p}, a, b,
                                         deterministic=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        return tp_psum_grads(jax.grad(loss_tp)(p), "model")

    tp_grads = jax.jit(shard_map(local_grads, mesh,
                                 in_specs=(P(), P(), P()), out_specs=P()))(
        params, props, query)

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_tp = jax.tree_util.tree_leaves(tp_grads)
    assert len(flat_ref) == len(flat_tp)
    for (path, a), b in zip(flat_ref, flat_tp):
        name = jax.tree_util.keystr(path)
        scale = max(1.0, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-5, atol=5e-5 * scale,
            err_msg=f"grad mismatch at {name}")


def _tp_cfg_model(dropout):
    cfg, _ = tiny_setup()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, t_dropout=dropout),
        tpu=dataclasses.replace(cfg.tpu, tp_size=TP))
    return cfg, AITDetector(cfg, dtype=jnp.float32)


@pytest.mark.slow
def test_tp_detector_step_matches_dp_only():
    # dropout off: the only stochasticity left (target sampling) draws the
    # same rng stream in both layouts (the data-axis fold is identical)
    cfg, model_tp = _tp_cfg_model(dropout=0.0)
    cfg1 = cfg.replace(tpu=dataclasses.replace(cfg.tpu, tp_size=1))
    model_1 = AITDetector(cfg1, dtype=jnp.float32)
    batch = tiny_batch(2, seed=3)
    tx, state = make_state(cfg1, model_1, batch)
    rng = jax.random.PRNGKey(11)

    mesh_dp = make_mesh(2)
    s_dp, m_dp = jax.jit(make_sharded_train_step(model_1, tx, mesh_dp))(
        replicate(state, mesh_dp), shard_batch(batch, mesh_dp), rng)

    mesh = make_mesh(4, axes=("data", "model"), shape=(2, TP))
    step = jax.jit(make_sharded_train_step(model_tp, tx, mesh,
                                           tp_axis="model"))
    s_tp, m_tp = step(replicate(state, mesh), shard_batch(batch, mesh), rng)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               rtol=1e-4)
    flat_dp = jax.tree_util.tree_leaves_with_path(s_dp.params)
    flat_tp = jax.tree_util.tree_leaves(s_tp.params)
    for (path, a), b in zip(flat_dp, flat_tp):
        scale = max(1e-3, float(np.abs(np.asarray(a)).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4 * scale,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.slow
def test_tp_detector_step_with_dropout_runs():
    cfg, model = _tp_cfg_model(dropout=0.1)
    batch = tiny_batch(2, seed=5)
    cfg1 = cfg.replace(tpu=dataclasses.replace(cfg.tpu, tp_size=1))
    tx, state = make_state(cfg1, AITDetector(cfg1, dtype=jnp.float32), batch)
    mesh = make_mesh(4, axes=("data", "model"), shape=(2, TP))
    step = jax.jit(make_sharded_train_step(model, tx, mesh, tp_axis="model"))
    new_state, metrics = step(replicate(state, mesh),
                              shard_batch(batch, mesh), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
    # params stay replicated/identical across all 4 devices
    leaf = new_state.params["transformer"]["enc_layer0"]["slf_attn"]["w_qs"][
        "kernel"]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
