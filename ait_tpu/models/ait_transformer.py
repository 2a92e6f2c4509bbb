"""The Adaptive Image Transformer: per-proposal encoder-decoder.

Semantics pinned to lib/model/system/Models.py:
  * enc_emb/dec_emb 1x1-conv embed 1024 -> 512 (`:188-193,246-247`);
  * the query feature map is tiled once per proposal (`:250`);
  * proposal tokens (len 49) are zero-padded with a source pad mask marking
    the padding (`:258-270`; the reference pads to the query length 64 —
    here only to the 8-aligned 56, which is exact because pad outputs are
    never consumed, see the in-line note at n_enc);
  * sinusoidal positions + dropout + input LayerNorm (`:26-51`, Encoder/Decoder
    `:98-99,155-156`);
  * encoder = n_layers x (self-attn + FFN) over proposal tokens; decoder =
    n_layers x (self-attn with CAUSAL mask + cross-attn to encoder + FFN) over
    query tokens (`:143-172`, mask `:17-23,262-263`); the `system_mask`
    ablation drops the causal mask — exposed here as `causal_mask=False`;
  * output reshaped to the query grid and 1x1-conv back to 1024 (`:276-278`).

Layout: feature maps are NHWC; token sequences [N, T, C].
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from ait_tpu.models.attention import MultiHeadAttention, PositionwiseFeedForward
from ait_tpu.models.layers import sinusoid_table, xavier_uniform

Dtype = Any


class EncoderLayer(nn.Module):
    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float
    dist: str
    dtype: Dtype = jnp.float32
    use_pallas: bool = True
    tp_size: int = 1
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x, mask, *, deterministic=True):
        tp = dict(tp_size=self.tp_size, tp_axis=self.tp_axis)
        x, _ = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            self.dist, self.dtype, use_pallas=self.use_pallas, **tp,
            name="slf_attn")(
                x, x, x, mask, deterministic=deterministic)
        return PositionwiseFeedForward(
            self.d_model, self.d_inner, self.dropout, self.dtype,
            use_pallas=self.use_pallas, **tp,
            name="pos_ffn")(x, deterministic=deterministic)


class DecoderLayer(nn.Module):
    d_model: int
    d_inner: int
    n_head: int
    d_k: int
    d_v: int
    dropout: float
    dist: str
    dtype: Dtype = jnp.float32
    use_pallas: bool = True
    tp_size: int = 1
    tp_axis: str = "model"

    @nn.compact
    def __call__(self, x, enc_out, slf_mask, cross_mask, *, deterministic=True,
                 repeat: int = 1):
        tp = dict(tp_size=self.tp_size, tp_axis=self.tp_axis)
        x, _ = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            self.dist, self.dtype, use_pallas=self.use_pallas, **tp,
            name="slf_attn")(
                x, x, x, slf_mask, deterministic=deterministic)
        if repeat > 1:
            # eval-path de-duplication: the decoder stream is per-IMAGE until
            # cross-attention (the reference tiles the query per proposal
            # BEFORE the decoder, Models.py:250 — identical rows when
            # dropout is off); repeating here is bitwise the same and runs
            # the input LN + self-attention once per image, not per proposal
            x = jnp.repeat(x, repeat, axis=0)
        x, _ = MultiHeadAttention(
            self.n_head, self.d_model, self.d_k, self.d_v, self.dropout,
            self.dist, self.dtype, use_pallas=self.use_pallas, **tp,
            name="enc_attn")(
                x, enc_out, enc_out, cross_mask, deterministic=deterministic)
        return PositionwiseFeedForward(
            self.d_model, self.d_inner, self.dropout, self.dtype,
            use_pallas=self.use_pallas, **tp,
            name="pos_ffn")(x, deterministic=deterministic)


class AITTransformer(nn.Module):
    """[BP, hp, wp, C] proposals x [B, hq, wq, C] query -> [BP, hq, wq, C]."""

    d_word_vec: int = 512
    d_model: int = 512
    d_inner: int = 2048
    n_layers: int = 1
    n_head: int = 8
    d_k: int = 64
    d_v: int = 64
    n_position: int = 64
    dropout: float = 0.1
    causal_mask: bool = True
    dist: str = "softmax"
    channels: int = 1024  # in/out feature channels (d_word_vec * 2)
    dtype: Dtype = jnp.float32
    use_pallas: bool = True
    tp_size: int = 1
    tp_axis: str = "model"
    # Train-time decoder-prefix sharing (cfg.tpu.dec_prefix_per_image): the
    # decoder input is the SAME query tiled once per proposal (Models.py:250),
    # so until cross-attention the per-proposal streams differ only in their
    # dropout draws.  With this flag the prefix (dec_emb, pos-enc glue, first
    # self-attention) runs once per image and each image's proposals share
    # its dropout masks: the expected gradient is unchanged (each mask has
    # the same marginal law; the loss is a sum over proposals), only the
    # masking noise within an image becomes correlated.  Off = reference-
    # exact iid per-proposal masks.  Eval is bitwise unaffected either way.
    dec_prefix_per_image: bool = False

    @nn.compact
    def __call__(self, x_props, x_query, *, deterministic: bool = True):
        bp, hp, wp, _ = x_props.shape
        bs, hq, wq, _ = x_query.shape
        num_props = bp // bs
        d = self.d_word_vec

        xavier = xavier_uniform()
        x_props = nn.Conv(d, (1, 1), dtype=self.dtype, kernel_init=xavier,
                          name="enc_emb")(x_props)
        x_query = nn.Conv(d, (1, 1), dtype=self.dtype, kernel_init=xavier,
                          name="dec_emb")(x_query)

        src = x_props.reshape(bp, hp * wp, d)
        trg = x_query.reshape(bs, hq * wq, d)
        # at train time dropout draws differ per proposal, so the tile must
        # happen up front (reference semantics) unless dec_prefix_per_image
        # opts into shared per-image masks; at eval the repeat is always
        # deferred into the first decoder layer (see DecoderLayer.repeat)
        dec_repeat = num_props if (
            num_props > 1 and (deterministic or self.dec_prefix_per_image)
        ) else 1
        if dec_repeat == 1:
            trg = jnp.repeat(trg, num_props, axis=0)

        n_s, n_t = src.shape[1], trg.shape[1]
        # The reference zero-pads proposal tokens all the way to the query
        # length (49 -> 64, Models.py:269-270), but the pad tokens' encoder
        # outputs are never consumed — src_mask hides them as KEYS in both
        # the encoder self-attention and the decoder cross-attention, and
        # masked softmax columns are exactly 0 in f32 — so running the
        # encoder at the sublane-aligned real length (49 -> 56) is exact in
        # exact arithmetic (the narrower contraction reassociates f32
        # reductions by ~1e-3 abs) while cutting ~1/8 of the encoder's
        # FLOPs and memory traffic (parity: test_e2e_torch_parity.py).
        n_enc = min(n_t, -(-n_s // 8) * 8)
        src = jnp.pad(src, ((0, 0), (0, n_enc - n_s), (0, 0)))
        src_mask = (jnp.arange(n_enc) < n_s)[None, None, :]    # [1, 1, Te]
        if self.causal_mask:
            trg_mask = jnp.tril(jnp.ones((n_t, n_t), bool))[None]
        else:
            trg_mask = jnp.ones((1, n_t, n_t), bool)

        pos = sinusoid_table(self.n_position, d)[None].astype(src.dtype)

        if self.use_pallas:
            # fused pos-enc + dropout + input-LN glue (one Mosaic kernel
            # fwd and bwd instead of several memory-bound passes); param
            # paths unchanged (enc_in_ln/dec_in_ln scale+bias)
            import jax

            from ait_tpu.models.attention import _P
            from ait_tpu.ops.pallas_ffn import fused_posln, posln_reference

            def in_glue(x_seq, name):
                ln = _P((("scale", (d,), nn.initializers.ones),
                         ("bias", (d,), nn.initializers.zeros)),
                        name=name)()
                flat = x_seq.reshape(-1, d).astype(self.dtype)
                posf = pos[0, :x_seq.shape[1]].astype(self.dtype)
                train_drop = (not deterministic) and self.dropout > 0.0
                keep_prob = 1.0 - self.dropout if train_drop else 1.0
                if train_drop:
                    r0, r1 = jax.random.split(self.make_rng("dropout"))
                    seed = jax.random.randint(r0, (2,), -2 ** 31,
                                              2 ** 31 - 1, jnp.int32)
                    keep = jax.random.bernoulli(
                        r1, keep_prob, flat.shape).astype(jnp.float32)
                else:
                    seed = jnp.zeros((2,), jnp.int32)
                    keep = None

                def kernel_branch():
                    return fused_posln(flat, posf, ln["scale"], ln["bias"],
                                       seed, keep_prob)

                def ref_branch():
                    return posln_reference(flat, posf, ln["scale"],
                                           ln["bias"], keep, keep_prob)

                out = jax.lax.platform_dependent(tpu=kernel_branch,
                                                 default=ref_branch)
                return out.reshape(x_seq.shape)

            enc = in_glue(src, "enc_in_ln")
        else:
            drop = nn.Dropout(self.dropout, deterministic=deterministic)
            enc = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                               name="enc_in_ln")(drop(src + pos[:, :n_enc]))
        for i in range(self.n_layers):
            enc = EncoderLayer(
                self.d_model, self.d_inner, self.n_head, self.d_k, self.d_v,
                self.dropout, self.dist, self.dtype, self.use_pallas,
                self.tp_size, self.tp_axis,
                name=f"enc_layer{i}")(
                    enc, src_mask, deterministic=deterministic)

        if self.use_pallas:
            dec = in_glue(trg, "dec_in_ln")
        else:
            dec = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                               name="dec_in_ln")(drop(trg + pos[:, :n_t]))
        for i in range(self.n_layers):
            dec = DecoderLayer(
                self.d_model, self.d_inner, self.n_head, self.d_k, self.d_v,
                self.dropout, self.dist, self.dtype, self.use_pallas,
                self.tp_size, self.tp_axis,
                name=f"dec_layer{i}")(
                    dec, enc, trg_mask, src_mask, deterministic=deterministic,
                    repeat=dec_repeat if i == 0 else 1)

        out = dec.reshape(bp, hq, wq, d)
        out = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                      kernel_init=xavier, name="dec_trans")(out)
        return out
