"""Fused Pallas attention kernel vs the jnp reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ait_tpu.ops.pallas_attention import (_reference_impl,
                                          fused_sh_attention,
                                          fused_sh_attention_dropout)


def make_args(rng, p=8, tq=64, tk=64, d=512, h=8, dk=64):
    def arr(*shape, scale=1.0):
        return jnp.asarray(rng.randn(*shape) * scale, jnp.float32)

    return [
        arr(p, tq, d), arr(p, tk, d),
        arr(d, h * dk, scale=0.02), arr(d, h * dk, scale=0.02),
        arr(d, h * dk, scale=0.02), arr(dk, h * dk, scale=0.02),
        arr(h * dk, scale=0.02), arr(dk, d, scale=0.02),
        jnp.asarray(1.0 + 0.1 * rng.randn(d), jnp.float32),
        jnp.asarray(0.1 * rng.randn(d), jnp.float32),
    ]


@pytest.mark.parametrize("mask_kind", ["causal", "pad", "full"])
# division+mask is numerically degenerate (-1e9 logits ride the
# division); the model gates the fused path to softmax
@pytest.mark.parametrize("dist", ["softmax"])
def test_kernel_matches_reference(mask_kind, dist):
    rng = np.random.RandomState(0)
    args = make_args(rng)
    tq = tk = 64
    if mask_kind == "causal":
        mask = jnp.tril(jnp.ones((tq, tk), bool))
    elif mask_kind == "pad":
        mask = jnp.broadcast_to((jnp.arange(tk) < 49)[None], (tq, tk))
    else:
        mask = jnp.ones((tq, tk), bool)
    ref = _reference_impl(*args, mask, n_head=8, d_k=64, d_v=64, dist=dist)
    got = fused_sh_attention(*args, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


@pytest.mark.parametrize("tq,tk,pair_tile", [
    (150, 64, 1),    # co-attention q2i shape class: long UNALIGNED queries
    (64, 150, 1),    # co-attention i2q shape class: long unaligned keys
    (150, 64, 2),    # multi-pair tile over long queries
])
def test_kernel_long_sequence_matches_reference(tq, tk, pair_tile):
    """Long-sequence fusion (the co-attention MHAs: one side ~1900 tokens,
    the other 64; rows not a multiple of the 8-sublane tile)."""
    rng = np.random.RandomState(5)
    h, dk, d, p = 4, 32, 128, 2
    args = make_args(rng, p=p, tq=tq, tk=tk, d=d, h=h, dk=dk)
    mask = jnp.ones((tq, tk), bool)
    ref = _reference_impl(*args, mask, n_head=h, d_k=dk, d_v=dk,
                          dist="softmax")
    got = fused_sh_attention(*args, mask, n_head=h, d_k=dk, d_v=dk,
                             pair_tile=pair_tile, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


@pytest.mark.slow
def test_kernel_long_sequence_vjp_matches_reference_grad():
    rng = np.random.RandomState(6)
    h, dk, d, p, tq, tk = 4, 32, 128, 2, 100, 48
    args = make_args(rng, p=p, tq=tq, tk=tk, d=d, h=h, dk=dk)
    mask = jnp.ones((tq, tk), bool)

    def via_kernel(*a):
        return (fused_sh_attention(*a, mask, n_head=h, d_k=dk, d_v=dk,
                                   pair_tile=1, interpret=True) ** 2).sum()

    def via_ref(*a):
        return (_reference_impl(*a, mask, n_head=h, d_k=dk, d_v=dk,
                                dist="softmax") ** 2).sum()

    g1 = jax.grad(via_kernel, argnums=tuple(range(10)))(*args)
    g2 = jax.grad(via_ref, argnums=tuple(range(10)))(*args)
    names = ["xq", "xkv", "wq", "wk", "wv", "skw", "skb", "fcw", "lns",
             "lnb"]
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-3, err_msg=n)


def make_keep_masks(rng, p=8, tq=64, tk=64, d=512, h=8, keep=0.9):
    # head-major flat layouts (see pallas_attention._reference_impl)
    return (jnp.asarray(rng.rand(h, p * tq, tk) < keep),
            jnp.asarray(rng.rand(p * tq, d) < keep))


def test_dropout_kernel_matches_reference():
    rng = np.random.RandomState(2)
    args = make_args(rng)
    mask = jnp.broadcast_to((jnp.arange(64) < 49)[None], (64, 64))
    attn_keep, out_keep = make_keep_masks(rng)
    ref = _reference_impl(*args, mask, attn_keep, out_keep, n_head=8,
                          d_k=64, d_v=64, dist="softmax", keep_prob=0.9)
    got = fused_sh_attention_dropout(*args, mask, attn_keep, out_keep,
                                     keep_prob=0.9, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


@pytest.mark.slow
def test_dropout_kernel_vjp_matches_reference_grad():
    rng = np.random.RandomState(3)
    args = make_args(rng, p=4)
    mask = jnp.tril(jnp.ones((64, 64), bool))
    attn_keep, out_keep = make_keep_masks(rng, p=4)

    def via_kernel(xq, w):
        return fused_sh_attention_dropout(
            xq, args[1], w, *args[3:], mask, attn_keep, out_keep,
            keep_prob=0.9, interpret=True).sum()

    def via_ref(xq, w):
        return _reference_impl(xq, args[1], w, *args[3:], mask, attn_keep,
                               out_keep, n_head=8, d_k=64, d_v=64,
                               dist="softmax", keep_prob=0.9).sum()

    g1 = jax.grad(via_kernel, argnums=(0, 1))(args[0], args[2])
    g2 = jax.grad(via_ref, argnums=(0, 1))(args[0], args[2])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)


@pytest.mark.slow
def test_kernel_vjp_matches_reference_grad():
    """Fused backward kernel vs autodiff-of-reference, every cotangent."""
    rng = np.random.RandomState(1)
    args = make_args(rng, p=4)
    mask = jnp.broadcast_to((jnp.arange(64) < 49)[None], (64, 64))

    def via_kernel(*a):
        return (fused_sh_attention(*a, mask, interpret=True) ** 2).sum()

    def via_ref(*a):
        return (_reference_impl(*a, mask, n_head=8, d_k=64, d_v=64,
                                dist="softmax") ** 2).sum()

    g1 = jax.grad(via_kernel, argnums=tuple(range(10)))(*args)
    g2 = jax.grad(via_ref, argnums=tuple(range(10)))(*args)
    names = ["xq", "xkv", "wq", "wk", "wv", "skw", "skb", "fcw", "lns",
             "lnb"]
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-3, err_msg=n)


@pytest.mark.slow
def test_dropout_kernel_vjp_all_cotangents():
    rng = np.random.RandomState(4)
    args = make_args(rng, p=4)
    mask = jnp.broadcast_to((jnp.arange(64) < 49)[None], (64, 64))
    attn_keep, out_keep = make_keep_masks(rng, p=4)
    attn_keep = attn_keep.astype(jnp.float32)
    out_keep = out_keep.astype(jnp.float32)

    def via_kernel(*a):
        return (fused_sh_attention_dropout(
            *a, mask, attn_keep, out_keep, keep_prob=0.9,
            interpret=True) ** 2).sum()

    def via_ref(*a):
        return (_reference_impl(*a, mask, attn_keep, out_keep, n_head=8,
                                d_k=64, d_v=64, dist="softmax",
                                keep_prob=0.9) ** 2).sum()

    g1 = jax.grad(via_kernel, argnums=tuple(range(10)))(*args)
    g2 = jax.grad(via_ref, argnums=tuple(range(10)))(*args)
    names = ["xq", "xkv", "wq", "wk", "wv", "skw", "skb", "fcw", "lns",
             "lnb"]
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                                   rtol=1e-3, err_msg=n)
