"""Sequence-parallel cross-attention (parallel/sp.py): exact match with
the unsharded softmax attention, forward and grads, on a 4-shard virtual
mesh — with and without a key mask."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ait_tpu.parallel import make_mesh
from ait_tpu.parallel.sharded import shard_map
from ait_tpu.parallel.sp import seq_parallel_attention, shard_seq


def full_attention(q, k, v, scale, mask=None):
    s = jnp.einsum("...qd,...kd->...qk", q, k) * scale
    if mask is not None:
        s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kv->...qv", p, v)


@pytest.mark.parametrize("masked", [False, True])
def test_seq_parallel_matches_full_fwd_and_grad(masked):
    rng = np.random.RandomState(0)
    h, tq, tk, dk, dv, s = 2, 8, 32, 16, 16, 4
    scale = 1.0 / dk ** 0.5
    q = jnp.asarray(rng.randn(h, tq, dk), jnp.float32)
    k = jnp.asarray(rng.randn(h, tk, dk), jnp.float32)
    v = jnp.asarray(rng.randn(h, tk, dv), jnp.float32)
    mask = jnp.asarray(rng.rand(h, tq, tk) < 0.7) if masked else None
    if masked:
        # keep at least one attendable key per query
        mask = mask.at[..., 0].set(True)

    mesh = make_mesh(s, axes=("seq",))

    def local(q, k_s, v_s, m_s):
        return seq_parallel_attention(q, k_s, v_s, "seq", scale, m_s)

    sp = jax.jit(shard_map(
        local, mesh,
        in_specs=(P(), P(None, "seq"), P(None, "seq"),
                  P(None, None, "seq") if masked else P()),
        out_specs=P()))

    m_arg = mask if masked else jnp.zeros((), jnp.float32)
    got = sp(q, k, v, m_arg) if masked else jax.jit(shard_map(
        lambda q, k_s, v_s: seq_parallel_attention(q, k_s, v_s, "seq",
                                                   scale),
        mesh, in_specs=(P(), P(None, "seq"), P(None, "seq")),
        out_specs=P()))(q, k, v)
    want = full_attention(q, k, v, scale, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)

    # grads wrt q, k, v
    if masked:
        def loss_sp(q, k, v):
            return (sp(q, k, v, m_arg) ** 2).sum()
    else:
        sp2 = jax.jit(shard_map(
            lambda q, k_s, v_s: seq_parallel_attention(q, k_s, v_s, "seq",
                                                       scale),
            mesh, in_specs=(P(), P(None, "seq"), P(None, "seq")),
            out_specs=P()))

        def loss_sp(q, k, v):
            return (sp2(q, k, v) ** 2).sum()

    def loss_full(q, k, v):
        return (full_attention(q, k, v, scale, mask) ** 2).sum()

    g_sp = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(q, k, v)
    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_sp, g_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=2e-6, err_msg=name)


def test_seq_parallel_coattention_shapes():
    """The i2q co-attention regime: 64 queries against 1900 sharded keys
    (1900 doesn't divide the mesh — shard the padded 1920 with the pad
    masked off, the production recipe for unaligned sequences)."""
    rng = np.random.RandomState(1)
    tq, tk, d, s = 64, 1900, 32, 4
    pad = (-tk) % s
    scale = 1.0 / d ** 0.5
    q = jnp.asarray(rng.randn(tq, d), jnp.float32)
    k = jnp.asarray(rng.randn(tk, d), jnp.float32)
    v = jnp.asarray(rng.randn(tk, d), jnp.float32)
    kp = jnp.pad(k, ((0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, pad), (0, 0)))
    mask = jnp.arange(tk + pad) < tk             # [1920]
    mesh = make_mesh(s, axes=("seq",))

    sp = jax.jit(shard_map(
        lambda q, k_s, v_s, m_s: seq_parallel_attention(
            q, k_s, v_s, "seq", scale,
            jnp.broadcast_to(m_s[None], (tq, m_s.shape[0]))),
        mesh, in_specs=(P(), P("seq"), P("seq"), P("seq")),
        out_specs=P()))
    got = sp(q, kp, vp, mask)
    want = full_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-6)
