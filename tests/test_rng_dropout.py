"""In-kernel PRNG dropout plumbing (interpret mode).

The TPU-semantics interpreter stubs prng_random_bits to zeros, i.e. every
mask is all-keep — so CPU can only pin the keep-all limit and the dump/
kernel consistency; real-bit parity runs on hardware in
tools/tpu_kernel_check.py (rng_dropout check: mask stats ~ keep_prob,
fwd/bwd equal to the reference fed the dumped masks)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ait_tpu.ops.pallas_attention import (_reference_impl,
                                          dropout_keep_masks,
                                          fused_sh_attention_rngdrop)

P, TQ, TK, D, H, DK = 4, 64, 64, 512, 8, 64


@pytest.fixture(scope="module")
def attn_args():
    rng = np.random.RandomState(0)

    def arr(*shape, scale=1.0):
        return jnp.asarray(rng.randn(*shape) * scale, jnp.float32)

    args = [arr(P, TQ, D), arr(P, TK, D),
            arr(D, H * DK, scale=0.02), arr(D, H * DK, scale=0.02),
            arr(D, H * DK, scale=0.02), arr(DK, H * DK, scale=0.02),
            arr(H * DK, scale=0.02), arr(DK, D, scale=0.02),
            jnp.asarray(1.0 + 0.1 * rng.randn(D), jnp.float32),
            jnp.asarray(0.1 * rng.randn(D), jnp.float32)]
    mask = jnp.broadcast_to((jnp.arange(TK) < 49)[None], (TQ, TK))
    return args, mask


SEED = jnp.asarray([123, -456], jnp.int32)


def _keep_all_ref(args, mask):
    ak = jnp.ones((H, P * TQ, TK), jnp.float32)
    ok = jnp.ones((P * TQ, D), jnp.float32)
    return _reference_impl(*args, mask, ak, ok, n_head=H, d_k=DK, d_v=DK,
                           dist="softmax", keep_prob=0.9)


def test_fwd_keep_all_limit(attn_args):
    args, mask = attn_args
    ref = _keep_all_ref(args, mask)
    got = fused_sh_attention_rngdrop(*args, mask, SEED, H, DK, DK,
                                     "softmax", 0.9, 8, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5,
                               rtol=1e-5)


def test_mask_dump_consistent_with_kernel_stub(attn_args):
    # interpret stub: zeros < thresh -> keep everywhere, both in the dump
    # and inside the fused kernel (consistency of the seeding scheme)
    ak, ok = dropout_keep_masks(SEED, P, TQ, TK, D, n_head=H,
                                keep_prob=0.9, interpret=True)
    assert float(np.asarray(ak).min()) == 1.0
    assert float(np.asarray(ok).min()) == 1.0


def test_bwd_keep_all_limit(attn_args):
    args, mask = attn_args

    def via_kernel(xq, w):
        return fused_sh_attention_rngdrop(
            xq, args[1], w, *args[3:], mask, SEED, H, DK, DK, "softmax",
            0.9, 8, True).sum()

    def via_ref(xq, w):
        ak = jnp.ones((H, P * TQ, TK), jnp.float32)
        ok = jnp.ones((P * TQ, D), jnp.float32)
        return _reference_impl(
            xq, args[1], w, *args[3:], mask, ak, ok, n_head=H, d_k=DK,
            d_v=DK, dist="softmax", keep_prob=0.9).sum()

    g1 = jax.grad(via_kernel, argnums=(0, 1))(args[0], args[2])
    g2 = jax.grad(via_ref, argnums=(0, 1))(args[0], args[2])
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   rtol=1e-4)
