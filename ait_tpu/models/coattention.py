"""Image<->query co-attention, both reference flavors.

* `MHACoAttention` — the VOC model's pair of cross MultiHeadAttentions after a
  1x1-conv embed to 512 and a linear map back to 1024
  (faster_rcnn_sys_transformer_sk_dilat.py:31-102).
* `NonLocalCoAttention` — the COCO model's single shared-embedding bilinear
  relation with 'division' (or 'softmax') normalization and zero-initialized
  GroupNorm output projections so the residual starts as identity
  (blocks_coatt_transformer_sk.py:17-122).

Both map ([B, Hi, Wi, C], [B, Hq, Wq, C]) -> same shapes, C=1024, NHWC.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ait_tpu.models.attention import MultiHeadAttention
from ait_tpu.models.layers import ZeroInitGroupNorm

Dtype = Any


class MHACoAttention(nn.Module):
    channels: int = 1024
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    tp_size: int = 1            # head-sharded tensor parallelism (attention.py)
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x_img, x_qry, *, deterministic: bool = True):
        b, hi, wi, c = x_img.shape
        _, hq, wq, _ = x_qry.shape
        d = self.channels // 2

        img = nn.Conv(d, (1, 1), dtype=self.dtype, name="img_emb")(x_img)
        qry = nn.Conv(d, (1, 1), dtype=self.dtype, name="qry_emb")(x_qry)
        img = img.reshape(b, hi * wi, d)
        qry = qry.reshape(b, hq * wq, d)

        # note the reference's naming is crossed: q2i_attn attends image->query
        tp = dict(tp_size=self.tp_size, tp_axis=self.tp_axis)
        enc_img, _ = MultiHeadAttention(
            self.n_head, d, self.d_k, self.d_v, self.dropout,
            dtype=self.dtype, **tp, name="q2i_attn")(
                img, qry, qry, deterministic=deterministic)
        enc_qry, _ = MultiHeadAttention(
            self.n_head, d, self.d_k, self.d_v, self.dropout,
            dtype=self.dtype, **tp, name="i2q_attn")(
                qry, img, img, deterministic=deterministic)

        enc_img = nn.Dense(c, dtype=self.dtype, name="img_trans")(enc_img)
        enc_qry = nn.Dense(c, dtype=self.dtype, name="qry_trans")(enc_qry)
        return enc_img.reshape(b, hi, wi, c), enc_qry.reshape(b, hq, wq, c)


class NonLocalCoAttention(nn.Module):
    channels: int = 1024
    normalization: str = "division"  # 'division' | 'softmax'
    with_residual: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_img, x_qry, *, deterministic: bool = True):
        del deterministic  # no dropout in this flavor
        b, hi, wi, c = x_img.shape
        _, hq, wq, _ = x_qry.shape
        d = self.channels // 2

        emb = nn.Conv(d, (1, 1), dtype=self.dtype, name="emb")
        emb_img = emb(x_img).reshape(b, hi * wi, d)
        emb_qry = emb(x_qry).reshape(b, hq * wq, d)
        rho_qry = nn.Conv(d, (1, 1), dtype=self.dtype,
                          name="rho")(x_qry).reshape(b, hq * wq, d)
        phi_img = nn.Conv(d, (1, 1), dtype=self.dtype,
                          name="phi")(x_img).reshape(b, hi * wi, d)

        rel = jnp.einsum("bqd,bid->bqi", rho_qry, phi_img,
                         preferred_element_type=jnp.float32)  # [B, Nq, Ni]
        n_q, n_i = rel.shape[1], rel.shape[2]
        if self.normalization == "softmax":
            q2i = nn.softmax(rel, axis=2)
            i2q = nn.softmax(rel.transpose(0, 2, 1), axis=2)
        elif self.normalization == "division":
            q2i = rel / n_i
            i2q = rel.transpose(0, 2, 1) / n_q
        else:
            raise ValueError(self.normalization)
        q2i = q2i.astype(emb_img.dtype)
        i2q = i2q.astype(emb_img.dtype)

        non_img = jnp.einsum("biq,bqd->bid", i2q, emb_qry,
                             preferred_element_type=jnp.float32)
        non_img = non_img.astype(self.dtype).reshape(b, hi, wi, d)
        non_img = nn.Conv(c, (1, 1), dtype=self.dtype,
                          name="theta_conv")(non_img)
        non_img = ZeroInitGroupNorm(32, name="theta_gn")(non_img)

        non_qry = jnp.einsum("bqi,bid->bqd", q2i, emb_img,
                             preferred_element_type=jnp.float32)
        non_qry = non_qry.astype(self.dtype).reshape(b, hq, wq, d)
        non_qry = nn.Conv(c, (1, 1), dtype=self.dtype,
                          name="omega_conv")(non_qry)
        non_qry = ZeroInitGroupNorm(32, name="omega_gn")(non_qry)

        if self.with_residual:
            non_img = non_img + x_img
            non_qry = non_qry + x_qry
        return non_img, non_qry
