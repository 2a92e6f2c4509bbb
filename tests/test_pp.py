"""GPipe pipelining (parallel/pp.py): forward and grads == the sequential
stage composition, on 2- and 4-stage virtual meshes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ait_tpu.parallel import make_mesh
from ait_tpu.parallel.pp import (make_pipeline_apply, shard_stage_params,
                                 stack_stage_params)


def stage_fn(p, x):
    # a residual MLP block: same in/out structure, like a transformer layer
    h = jnp.tanh(x @ p["w1"] + p["b1"])
    return x + h @ p["w2"]


def make_stage_params(rng, d, hidden):
    return {"w1": jnp.asarray(rng.randn(d, hidden) * 0.3, jnp.float32),
            "b1": jnp.asarray(rng.randn(hidden) * 0.1, jnp.float32),
            "w2": jnp.asarray(rng.randn(hidden, d) * 0.3, jnp.float32)}


def sequential(stacked, x_mb):
    s = stacked["w1"].shape[0]

    def full(x):
        for i in range(s):
            p = jax.tree_util.tree_map(lambda a: a[i], stacked)
            x = stage_fn(p, x)
        return x

    return jax.vmap(full)(x_mb)


@pytest.mark.parametrize("n_stages,m", [(2, 4), (4, 8)])
def test_pipeline_matches_sequential_fwd_and_grad(n_stages, m):
    rng = np.random.RandomState(0)
    d, hidden, b = 16, 32, 4
    mesh = make_mesh(n_stages, axes=("stage",))
    stacked = stack_stage_params(
        [make_stage_params(rng, d, hidden) for _ in range(n_stages)])
    x = jnp.asarray(rng.randn(m, b, d), jnp.float32)

    pipelined = jax.jit(make_pipeline_apply(stage_fn, mesh, m))
    got = pipelined(shard_stage_params(stacked, mesh), x)
    want = sequential(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6,
                               atol=2e-6)

    def loss_pp(params, x):
        return (pipelined(params, x) ** 2).sum()

    def loss_seq(params, x):
        return (sequential(params, x) ** 2).sum()

    g_pp = jax.jit(jax.grad(loss_pp))(shard_stage_params(stacked, mesh), x)
    g_seq = jax.grad(loss_seq)(stacked, x)
    for (kp, a), (_, b_) in zip(
            jax.tree_util.tree_leaves_with_path(g_pp),
            jax.tree_util.tree_leaves_with_path(g_seq)):
        # f32, different reduction order than the sequential composition
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4,
                                   atol=1e-4, err_msg=str(kp))


def test_pipeline_no_allgather_in_hlo():
    rng = np.random.RandomState(1)
    d, hidden, b, m, s = 16, 32, 4, 4, 2
    mesh = make_mesh(s, axes=("stage",))
    stacked = stack_stage_params(
        [make_stage_params(rng, d, hidden) for _ in range(s)])
    x = jnp.asarray(rng.randn(m, b, d), jnp.float32)
    pipelined = jax.jit(make_pipeline_apply(stage_fn, mesh, m))
    hlo = pipelined.lower(
        shard_stage_params(stacked, mesh), x).compile().as_text()
    # activations hop via neighbor collective-permute; params stay put
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


@pytest.mark.slow
def test_pipeline_real_encoder_layers():
    """Pipeline 2 actual AIT EncoderLayers (the homogeneous blocks pp is
    for) over a 2-stage mesh and match the sequential apply."""
    from ait_tpu.models.ait_transformer import EncoderLayer

    rng = np.random.RandomState(2)
    d, s, m, b, t = 512, 2, 4, 2, 64
    layer = EncoderLayer(d_model=d, d_inner=2048, n_head=8, d_k=64, d_v=64,
                         dropout=0.1, dist="softmax", use_pallas=False)
    mask = jnp.ones((b, t, t), bool)
    x0 = jnp.asarray(rng.randn(b, t, d), jnp.float32)
    per_stage = [
        layer.init({"params": jax.random.PRNGKey(i)}, x0, mask)["params"]
        for i in range(s)]

    def stage(p, x):
        return layer.apply({"params": p}, x, mask, deterministic=True)

    mesh = make_mesh(s, axes=("stage",))
    stacked = stack_stage_params(per_stage)
    x = jnp.asarray(rng.randn(m, b, t, d), jnp.float32)

    got = jax.jit(make_pipeline_apply(stage, mesh, m))(
        shard_stage_params(stacked, mesh), x)

    def full(xi):
        for p in per_stage:
            xi = stage(p, xi)
        return xi

    want = jax.vmap(full)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5,
                               atol=2e-5)
