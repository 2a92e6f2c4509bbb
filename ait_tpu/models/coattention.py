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

from typing import Any, Optional

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
    # sequence parallelism over a 'seq' mesh axis (inference path, canvases
    # whose ~Hi*Wi image-token sequence outgrows one chip): the image tokens
    # are sharded — as ROWS in q2i_attn (image tokens are its queries) and
    # as KEYS in i2q_attn (exact distributed softmax, parallel/sp.py)
    sp_axis: Optional[str] = None

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
        sp = dict(sp_axis=self.sp_axis, use_pallas=self.sp_axis is None)
        enc_img, _ = MultiHeadAttention(
            self.n_head, d, self.d_k, self.d_v, self.dropout,
            dtype=self.dtype, **tp, **{**sp, "sp_role": "q"},
            name="q2i_attn")(
                img, qry, qry, deterministic=deterministic)
        enc_qry, _ = MultiHeadAttention(
            self.n_head, d, self.d_k, self.d_v, self.dropout,
            dtype=self.dtype, **tp, **{**sp, "sp_role": "kv"},
            name="i2q_attn")(
                qry, img, img, deterministic=deterministic)

        enc_img = nn.Dense(c, dtype=self.dtype, name="img_trans")(enc_img)
        enc_qry = nn.Dense(c, dtype=self.dtype, name="qry_trans")(enc_qry)
        return enc_img.reshape(b, hi, wi, c), enc_qry.reshape(b, hq, wq, c)


class NonLocalCoAttention(nn.Module):
    channels: int = 1024
    normalization: str = "division"  # 'division' | 'softmax'
    with_residual: bool = True
    dtype: Dtype = jnp.float32
    # sequence parallelism (inference path): image tokens sharded over this
    # mesh axis; the [Nq, Ni] relation matrix only ever materializes as the
    # local [Nq, Ni/S] shard (see _sp_forward)
    sp_axis: Optional[str] = None

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

        if self.sp_axis is not None:
            non_img, non_qry = self._sp_relation(emb_img, emb_qry, rho_qry,
                                                 phi_img)
        else:
            non_img, non_qry = self._relation(emb_img, emb_qry, rho_qry,
                                              phi_img)
        non_img = non_img.astype(self.dtype).reshape(b, hi, wi, d)
        non_img = nn.Conv(c, (1, 1), dtype=self.dtype,
                          name="theta_conv")(non_img)
        non_img = ZeroInitGroupNorm(32, name="theta_gn")(non_img)

        non_qry = non_qry.astype(self.dtype).reshape(b, hq, wq, d)
        non_qry = nn.Conv(c, (1, 1), dtype=self.dtype,
                          name="omega_conv")(non_qry)
        non_qry = ZeroInitGroupNorm(32, name="omega_gn")(non_qry)

        if self.with_residual:
            non_img = non_img + x_img
            non_qry = non_qry + x_qry
        return non_img, non_qry

    def _relation(self, emb_img, emb_qry, rho_qry, phi_img):
        """The reference's bilinear relation, both directions on one chip."""
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
        non_qry = jnp.einsum("bqi,bid->bqd", q2i, emb_img,
                             preferred_element_type=jnp.float32)
        return non_img, non_qry

    def _sp_relation(self, emb_img, emb_qry, rho_qry, phi_img):
        """Image tokens sharded over sp_axis; only [B, Nq, Ni/S] relation
        shards ever materialize.

        i2q (image tokens as rows, normalized over the SHORT Nq dim) is
        row-parallel with an all-gather of the finished rows; q2i
        (normalized over the sharded Ni dim) is a psum of shard partials
        for 'division' and sp.py's exact distributed softmax for 'softmax'.
        Inference path (no grad conventions needed beyond sp.py's)."""
        import jax

        from ait_tpu.parallel.sp import seq_parallel_attention
        from ait_tpu.parallel.tp import tp_allreduce

        axis = self.sp_axis
        s = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        b, n_i, d = phi_img.shape
        n_q = rho_qry.shape[1]
        t_loc = -(-n_i // s)

        def slc(x):
            xpad = jnp.pad(x, ((0, 0), (0, t_loc * s - n_i), (0, 0)))
            return jax.lax.dynamic_slice_in_dim(xpad, idx * t_loc, t_loc, 1)

        phi_loc, embi_loc = slc(phi_img), slc(emb_img)
        valid = (jnp.arange(t_loc) + idx * t_loc) < n_i

        rel = jnp.einsum("bqd,bid->bqi", rho_qry, phi_loc,
                         preferred_element_type=jnp.float32)  # [B, Nq, Tl]

        # ---- q2i: normalize over the SHARDED Ni dim -> non_qry [B, Nq, d]
        if self.normalization == "softmax":
            non_qry = seq_parallel_attention(
                rho_qry.astype(jnp.float32), phi_loc.astype(jnp.float32),
                embi_loc.astype(jnp.float32), axis,
                mask_shard=jnp.broadcast_to(valid[None, None, :],
                                            (b, n_q, t_loc)))
        else:
            relm = jnp.where(valid[None, None, :], rel, 0.0) / n_i
            non_qry = tp_allreduce(
                jnp.einsum("bqi,bid->bqd", relm.astype(emb_img.dtype),
                           embi_loc, preferred_element_type=jnp.float32),
                axis)

        # ---- i2q: image rows local, normalize over the FULL Nq dim ------
        rel_t = rel.transpose(0, 2, 1)                  # [B, Tl, Nq]
        if self.normalization == "softmax":
            i2q = nn.softmax(rel_t, axis=2)
        else:
            i2q = rel_t / n_q
        non_img = jnp.einsum("biq,bqd->bid", i2q.astype(emb_qry.dtype),
                             emb_qry, preferred_element_type=jnp.float32)
        full = jax.lax.all_gather(non_img, axis)        # [S, B, Tl, d]
        non_img = full.transpose(1, 0, 2, 3).reshape(b, s * t_loc, -1)
        return non_img[:, :n_i], non_qry
