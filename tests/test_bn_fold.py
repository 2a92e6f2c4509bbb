"""fold_frozen_bn: eval-time BN-into-conv constant folding is exact.

The frozen BN is a constant affine (reference freezes params AND stats,
resnet_sys_transformer_sk_dilat.py:435-441), so conv(x;k)*w + b ==
conv(x;k*w) + b.  The fold rewrites the params only — the module code is
untouched — and must reproduce backbone features and head outputs to
float-roundoff on nontrivial BN statistics."""

import numpy as np

import jax
import jax.numpy as jnp

from ait_tpu.models.resnet import (ResNetBackbone, ResNetTop,
                                   fold_frozen_bn)


def _randomize_bn(params, rng):
    """Give every FrozenBatchNorm nontrivial scale/bias/mean/var (init is
    ones/zeros, under which the fold is trivially a no-op)."""

    def walk(d):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                if {"scale", "bias", "mean", "var"} == set(v):
                    out[k] = {
                        "scale": jnp.asarray(
                            0.5 + rng.rand(*v["scale"].shape).astype("f")),
                        "bias": jnp.asarray(
                            rng.randn(*v["bias"].shape).astype("f") * 0.3),
                        "mean": jnp.asarray(
                            rng.randn(*v["mean"].shape).astype("f") * 0.2),
                        "var": jnp.asarray(
                            (0.3 + rng.rand(*v["var"].shape)).astype("f")),
                    }
                else:
                    out[k] = walk(v)
            else:
                out[k] = v
        return out

    return walk(params)


def test_fold_exact_backbone_and_top():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 80, 3).astype("f") * 0.5)

    bb = ResNetBackbone(variant="resnet50", dtype=jnp.float32)
    p = _randomize_bn(bb.init(jax.random.PRNGKey(0), x)["params"], rng)
    feat = bb.apply({"params": p}, x)
    feat_f = bb.apply({"params": fold_frozen_bn(p)}, x)
    np.testing.assert_allclose(np.asarray(feat_f), np.asarray(feat),
                               rtol=2e-4, atol=2e-4)
    # the fold must actually change the kernels (non-no-op on real stats)
    assert not np.allclose(
        np.asarray(p["layer1"]["block0"]["conv1"]["kernel"]),
        np.asarray(fold_frozen_bn(p)["layer1"]["block0"]["conv1"]["kernel"]))

    top = ResNetTop(variant="resnet50", dtype=jnp.float32)
    f = jnp.asarray(rng.randn(2, 7, 7, 1024).astype("f") * 0.2)
    pt = _randomize_bn(top.init(jax.random.PRNGKey(1), f)["params"], rng)
    out = top.apply({"params": pt}, f)
    out_f = top.apply({"params": fold_frozen_bn(pt)}, f)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out),
                               rtol=2e-4, atol=2e-4)


def test_bias_only_program_with_folded_params_matches():
    """The serving variant: BN_BIAS_ONLY program + folded params ==
    original program + original params (the pair serve_bench --fold_bn
    runs).  The bias-only program must NOT be used with unfolded params —
    asserted by showing it diverges there."""
    from ait_tpu.models import layers as layers_mod

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 64, 80, 3).astype("f") * 0.5)
    bb = ResNetBackbone(variant="resnet50", dtype=jnp.float32)
    p = _randomize_bn(bb.init(jax.random.PRNGKey(0), x)["params"], rng)
    want = np.asarray(bb.apply({"params": p}, x))
    try:
        layers_mod.BN_BIAS_ONLY = True
        got = np.asarray(bb.apply({"params": fold_frozen_bn(p)}, x))
        diverged = np.asarray(bb.apply({"params": p}, x))
    finally:
        layers_mod.BN_BIAS_ONLY = False
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    assert not np.allclose(diverged, want, atol=1e-3)


def test_folded_bn_is_pure_bias():
    """After the fold every BN computes EXACTLY x + b': scale=1 and
    var=1-eps reconstruct w' = rsqrt((1-eps)+eps) = rsqrt(1.0) = 1.0
    bit-for-bit in f32, and mean=0 makes the bias term b' itself."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype("f"))
    bb = ResNetBackbone(variant="resnet50", dtype=jnp.float32)
    p = _randomize_bn(bb.init(jax.random.PRNGKey(0), x)["params"], rng)
    bn = fold_frozen_bn(p)["layer1"]["block0"]["bn1"]
    w = np.asarray(bn["scale"] * jax.lax.rsqrt(bn["var"] + 1e-5))
    np.testing.assert_array_equal(w, np.ones_like(w))
    np.testing.assert_array_equal(np.asarray(bn["mean"]),
                                  np.zeros_like(np.asarray(bn["mean"])))
