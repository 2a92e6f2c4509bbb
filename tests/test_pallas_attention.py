"""Fused Pallas attention kernel vs the jnp reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ait_tpu.ops.pallas_attention import _reference_impl, fused_sh_attention


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


def test_kernel_vjp_matches_reference_grad():
    rng = np.random.RandomState(1)
    args = make_args(rng, p=4)
    mask = jnp.tril(jnp.ones((64, 64), bool))

    def via_kernel(xq):
        return fused_sh_attention(xq, *args[1:], mask,
                                  interpret=True).sum()

    def via_ref(xq):
        return _reference_impl(xq, *args[1:], mask, n_head=8, d_k=64,
                               d_v=64, dist="softmax").sum()

    g1 = jax.grad(via_kernel)(args[0])
    g2 = jax.grad(via_ref)(args[0])
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4,
                               rtol=1e-4)
