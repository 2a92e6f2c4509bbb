"""Attention primitives for the AIT head.

Semantics pinned to the reference NMT-derived package:
  * ScaledDotProductAttention with the 'softmax' or 'division' (attn / len_k)
    normalization (lib/model/system/Modules.py:16-29);
  * SHBlock "selective heads": an SK-style softmax gate over heads collapses
    the 8 heads into a single d_v-wide vector (SubLayers.py:9-39);
  * MultiHeadAttention applies SHBlock then Linear(d_v -> d_model), dropout,
    residual, post-LayerNorm (SubLayers.py:41-102);
  * PositionwiseFeedForward is post-LN (SubLayers.py:167-187).

Masks here are boolean with True = attend (the reference uses uint8 and
`masked_fill(mask == 0, -1e9)`, Modules.py:20-21).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn

from ait_tpu.models.layers import xavier_uniform

Dtype = Any


def scaled_dot_attention(q, k, v, *, temperature, mask=None, dist="softmax",
                         dropout=None):
    """q,k,v: [..., T, d].  mask broadcastable to [..., Tq, Tk], True=attend."""
    attn = jnp.einsum(
        "...qd,...kd->...qk", q / temperature, k,
        preferred_element_type=jnp.float32)
    if mask is not None:
        attn = jnp.where(mask, attn, -1e9)
    if dist == "softmax":
        attn = nn.softmax(attn, axis=-1)
    elif dist == "division":
        attn = attn / attn.shape[-1]
    else:
        raise ValueError(dist)
    if dropout is not None:
        attn = dropout(attn)
    out = jnp.einsum("...qk,...kd->...qd", attn.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(v.dtype)
    return out, attn


class SHBlock(nn.Module):
    """Selective-heads gate (SubLayers.py:9-39).

    x: [B, n_head, T, d_v] -> gated x (same shape); caller sums over heads.
    """

    n_head: int
    d_v: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        u = jnp.sum(x, axis=1)            # [B, T, d_v]
        s = jnp.mean(u, axis=1)           # [B, d_v]  (GAP over tokens)
        gate = nn.Dense(self.d_v * self.n_head, dtype=self.dtype,
                        name="sk")(s)
        gate = gate.reshape(-1, self.n_head, self.d_v)
        gate = nn.softmax(gate.astype(jnp.float32), axis=1).astype(x.dtype)
        return x * gate[:, :, None, :]


class MultiHeadAttention(nn.Module):
    """MHA with selective-head collapse (SubLayers.py:41-102)."""

    n_head: int = 8
    d_model: int = 512
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.1
    dist: str = "softmax"
    dtype: Dtype = jnp.float32
    kernel_init: Any = xavier_uniform()

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True):
        b, lq = q.shape[0], q.shape[1]
        residual = q

        def proj(x, d, name):
            y = nn.Dense(self.n_head * d, use_bias=False, dtype=self.dtype,
                         kernel_init=self.kernel_init, name=name)(x)
            return y.reshape(b, x.shape[1], self.n_head, d).transpose(0, 2, 1, 3)

        qh = proj(q, self.d_k, "w_qs")
        kh = proj(k, self.d_k, "w_ks")
        vh = proj(v, self.d_v, "w_vs")

        if mask is not None:
            mask = mask[:, None]  # head axis

        attn_drop = nn.Dropout(self.dropout, deterministic=deterministic)
        out, attn = scaled_dot_attention(
            qh, kh, vh, temperature=self.d_k ** 0.5, mask=mask,
            dist=self.dist, dropout=attn_drop)

        if self.n_head > 1:
            out = SHBlock(self.n_head, self.d_v, self.dtype, name="sh")(out)
            out = jnp.sum(out, axis=1)  # collapse heads: [B, lq, d_v]
            fc_in = self.d_v
        else:
            out = out.transpose(0, 2, 1, 3).reshape(b, lq, -1)
            fc_in = self.n_head * self.d_v
        del fc_in
        out = nn.Dense(self.d_model, use_bias=False, dtype=self.dtype,
                       kernel_init=self.kernel_init, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        out = out + residual
        out = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(out)
        return out, attn


class PositionwiseFeedForward(nn.Module):
    """Post-LN FFN (SubLayers.py:167-187)."""

    d_in: int
    d_hid: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    kernel_init: Any = xavier_uniform()

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        residual = x
        y = nn.Dense(self.d_hid, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="w_1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_in, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="w_2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = y + residual
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(y)
