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

MultiHeadAttention owns raw parameter leaves (param-holder submodules keep
the tree paths `w_qs/kernel`, `sh/sk/{kernel,bias}`, `fc/kernel`,
`LayerNorm_0/{scale,bias}` stable for checkpoint conversion) so the whole
block can dispatch to the fused Pallas kernel
(ops/pallas_attention.fused_sh_attention) on TPU for short sequences —
including training, where dropout keep-masks are generated here from the
module's `dropout` rng and applied inside the kernel; the XLA path remains
as the reference math for long sequences / other dists / other platforms.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ait_tpu.ops.pallas_attention import (fused_sh_attention,
                                          fused_sh_attention_dropout,
                                          fused_sh_attention_rngdrop)

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform

# module-level switch for the long-sequence fused path (dataclass defaults
# are baked at class creation, so tools/diff_bench.py toggles this instead
# of the `pallas_long_seq` field).  Default OFF: the A/B on the real chip
# (tools/diff_bench.py --mode base longseq) measured the fused co-attention
# at +1.8 ms/step vs XLA at the flagship 1900x64 shapes — XLA's unfused
# long-sequence attention wins there, so fusion stays opt-in for other
# shape regimes.
_LONG_SEQ_FUSION = False


class _P(nn.Module):
    """Named parameter holder: creates `<name>/<leaf>` paths."""

    leaves: Tuple[tuple, ...]  # ((leaf_name, shape, init), ...)

    @nn.compact
    def __call__(self):
        out = {n: self.param(n, init, shape) for n, shape, init in self.leaves}
        return out if len(out) > 1 else next(iter(out.values()))


class _SHParams(nn.Module):
    d_v: int
    n_head: int

    @nn.compact
    def __call__(self):
        return _P((("kernel", (self.d_v, self.d_v * self.n_head),
                    nn.initializers.lecun_normal()),
                   ("bias", (self.d_v * self.n_head,),
                    nn.initializers.zeros)), name="sk")()


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
    use_pallas: bool = True
    pallas_max_tokens: int = 128  # both-sides-short fused path bound
    # long-sequence fusion (the co-attention MHAs: ~1900 image tokens against
    # 64 query tokens): fuse when ONE side is short and the [Tq, Tk]
    # attention area still fits VMEM comfortably; the pair tile shrinks so
    # each grid step stays within the scoped-VMEM budget.  Gated by the
    # module-level _LONG_SEQ_FUSION (default off — measured slower than XLA
    # at the flagship shapes; see that flag's comment)
    pallas_long_seq: bool = True
    pallas_max_area: int = 192 * 1024
    # training-path fusion (fused forward + fused recompute-backward
    # kernels, dropout via keep-mask operands); escape hatch for ablation
    use_pallas_train: bool = True
    # generate the dropout keep-masks inside the kernel (pltpu PRNG) instead
    # of passing them as operands; saves mask RNG + ~450 MB/step HBM
    in_kernel_dropout: bool = True
    # Megatron-style tensor parallelism: when tp_size > 1 the module must be
    # running inside shard_map over a mesh with axis `tp_axis`; heads are
    # computed shard-locally from block-slices of the (replicated) params and
    # combined with explicit collectives.  See ait_tpu/parallel/tp.py for the
    # matching gradient reduction.
    tp_size: int = 1
    tp_axis: Optional[str] = None
    # Sequence parallelism over a 'seq' mesh axis (parallel/sp.py): the
    # module must be running inside shard_map over a mesh with `sp_axis`.
    # sp_role picks which operand's TOKEN dim is sharded:
    #   'kv' — k/v tokens sharded (distributed softmax over keys; the
    #          co-attention i2q direction, image tokens as keys);
    #   'q'  — query tokens sharded (row-parallel; the q2i direction, image
    #          tokens as queries; output rows are all-gathered back).
    # Inference-path feature for beyond-chip canvases — softmax dist only,
    # deterministic only (the train path raises).
    sp_axis: Optional[str] = None
    sp_role: str = "kv"

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray] = None,
                 *, deterministic: bool = True):
        b, lq = q.shape[0], q.shape[1]
        lk = k.shape[1]
        residual = q

        init = self.kernel_init
        wq = _P((("kernel", (q.shape[-1], self.n_head * self.d_k), init),),
                name="w_qs")()
        wk = _P((("kernel", (k.shape[-1], self.n_head * self.d_k), init),),
                name="w_ks")()
        wv = _P((("kernel", (v.shape[-1], self.n_head * self.d_v), init),),
                name="w_vs")()
        if self.n_head > 1:
            sh = _SHParams(self.d_v, self.n_head, name="sh")()
            fc_in = self.d_v
        else:
            sh = None
            fc_in = self.n_head * self.d_v
        fc = _P((("kernel", (fc_in, self.d_model), init),), name="fc")()
        ln = _P((("scale", (self.d_model,), nn.initializers.ones),
                 ("bias", (self.d_model,), nn.initializers.zeros)),
                name="LayerNorm_0")()

        def out_proj_ln(out):
            """fc -> dropout -> residual -> post-LN tail (SubLayers.py:95-101),
            computed in f32 for the LN statistics."""
            out = out @ fc.astype(out.dtype)
            out = nn.Dropout(self.dropout,
                             deterministic=deterministic)(out)
            out = out + residual
            outf = out.astype(jnp.float32)
            mu = jnp.mean(outf, axis=-1, keepdims=True)
            var = jnp.mean((outf - mu) ** 2, axis=-1, keepdims=True)
            outf = (outf - mu) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + \
                ln["bias"]
            return outf.astype(self.dtype)

        if self.tp_size > 1:
            # (single-head MHA can't head-shard, and letting it fall through
            # would break parallel/tp.py's by-name grad psum — reject)
            assert self.n_head > 1, "tp_size > 1 requires n_head > 1"
            return self._tp_forward(q, k, v, mask, wq, wk, wv, sh, out_proj_ln,
                                    deterministic=deterministic)

        if self.sp_axis is not None:
            assert deterministic, \
                "sequence parallelism is an inference-path feature"
            assert self.dist == "softmax" and mask is None and self.n_head > 1
            if self.sp_role == "kv":
                return self._sp_kv_forward(q, k, v, wq, wk, wv, sh,
                                           out_proj_ln)
            return self._sp_q_forward(q, k, v, wq, wk, wv, sh, ln, fc)

        pmax = self.pallas_max_tokens
        fuse_short = lq <= pmax and lk <= pmax
        fuse_long = (self.pallas_long_seq and _LONG_SEQ_FUSION and
                     min(lq, lk) <= pmax and
                     lq * lk <= self.pallas_max_area)
        # pair tile: 16 is the tuned value for the AIT head's short
        # sequences; for long sequences bound the rows per grid step
        # 16 is the tuned short-sequence pair tile (re-A/B'd round 3 on
        # chip: 32 -> 84.3 pairs/sec vs 16 -> 87.5); AIT_PAIR_TILE
        # overrides for tile experiments
        pair_tile = (int(os.environ.get("AIT_PAIR_TILE", 16))
                     if fuse_short else max(1, 2048 // max(lq, lk)))
        if not deterministic and self.dropout > 0.0 and \
                not self.in_kernel_dropout:
            # the operand-keep-mask kernel variant rides flat [H, P*Tq, Tk]
            # layouts whose blocks need 8-divisible rows — only guaranteed
            # for the short-sequence (Tq<=128) shapes; the long-seq path
            # trains via in-kernel PRNG dropout instead
            fuse_long = False
        # the fused kernel takes ONE [lq, lk] mask for the whole pair batch;
        # only fuse when the mask is statically batch-invariant (leading dim
        # 1 — true of AIT's pad/causal masks, ait_transformer.py:144-148).
        # A per-example mask (batch dim > 1) falls through to the jnp
        # reference branch below, which applies it per example.
        fuse = (self.use_pallas and self.n_head > 1 and
                self.dist == "softmax" and
                k is v and (fuse_short or fuse_long) and
                (mask is None or mask.shape[0] == 1) and
                (deterministic or self.use_pallas_train or
                 self.dropout == 0.0))
        if fuse:
            if mask is None:
                mask2d = jnp.ones((lq, lk), bool)
            else:
                mask2d = jnp.broadcast_to(mask[0], (lq, lk))
            dt = self.dtype
            args = (q.astype(dt), k.astype(dt),
                    wq.astype(dt), wk.astype(dt), wv.astype(dt),
                    sh["kernel"].astype(dt), sh["bias"].astype(dt),
                    fc.astype(dt), ln["scale"], ln["bias"], mask2d)
            from ait_tpu.ops.pallas_attention import _reference_impl

            if not deterministic and self.dropout > 0.0:
                keep = 1.0 - self.dropout
                r0, r1, r2 = jax.random.split(self.make_rng("dropout"), 3)
                # bernoulli keep-masks for the non-TPU (jnp reference)
                # branch; on TPU the untaken branch and these mask ops are
                # DCE'd (platform_dependent resolves at lowering)
                attn_keep = jax.random.bernoulli(
                    r1, keep, (self.n_head, b * lq, lk)).astype(dt)
                out_keep = jax.random.bernoulli(
                    r2, keep, (b * lq, self.d_model)).astype(dt)
                if self.in_kernel_dropout:
                    # in-kernel pltpu PRNG: no mask generation or HBM
                    # traffic on TPU; noise differs bit-for-bit from the
                    # bernoulli path but is the same Bernoulli(keep)
                    # inverted dropout (ops/pallas_attention docstring)
                    seed = jax.random.randint(
                        r0, (2,), -2 ** 31, 2 ** 31 - 1, jnp.int32)
                    args = args + (seed, attn_keep, out_keep)

                    def kernel_branch(*a):
                        return fused_sh_attention_rngdrop(
                            *a[:11], a[11], self.n_head, self.d_k,
                            self.d_v, self.dist, keep, pair_tile)

                    def ref_branch(*a):
                        return _reference_impl(
                            *a[:11], a[12], a[13], n_head=self.n_head,
                            d_k=self.d_k, d_v=self.d_v, dist=self.dist,
                            keep_prob=keep)
                else:
                    # operand keep-masks applied in-kernel (the custom VJP
                    # replays the same masks — exact gradient).  Head-major
                    # FLAT layouts ([H, P*Tq, Tk] / [P*Tq, D]) so the
                    # kernel's pair packing is a row slice, never a concat.
                    args = args + (attn_keep, out_keep)

                    def kernel_branch(*a):
                        return fused_sh_attention_dropout(
                            *a, self.n_head, self.d_k, self.d_v, self.dist,
                            keep, pair_tile)

                    def ref_branch(*a):
                        return _reference_impl(*a, n_head=self.n_head,
                                               d_k=self.d_k, d_v=self.d_v,
                                               dist=self.dist,
                                               keep_prob=keep)
            else:
                def kernel_branch(*a):
                    return fused_sh_attention(*a, self.n_head, self.d_k,
                                              self.d_v, self.dist, pair_tile)

                def ref_branch(*a):
                    return _reference_impl(*a, n_head=self.n_head,
                                           d_k=self.d_k, d_v=self.d_v,
                                           dist=self.dist)

            # kernel only exists for real TPU lowering; every other
            # platform (CPU tests, CPU-device init) takes the jnp path
            out = jax.lax.platform_dependent(
                *args, tpu=kernel_branch, default=ref_branch)
            return out, None

        def proj(x, w, d):
            y = (x.astype(self.dtype) @ w.astype(self.dtype))
            return y.reshape(b, x.shape[1], self.n_head, d).transpose(
                0, 2, 1, 3)

        qh = proj(q, wq, self.d_k)
        kh = proj(k, wk, self.d_k)
        vh = proj(v, wv, self.d_v)

        if mask is not None:
            mask = mask[:, None]  # head axis

        attn_drop = nn.Dropout(self.dropout, deterministic=deterministic)
        out, attn = scaled_dot_attention(
            qh, kh, vh, temperature=self.d_k ** 0.5, mask=mask,
            dist=self.dist, dropout=attn_drop)

        if self.n_head > 1:
            # SHBlock gate (SubLayers.py:9-39)
            u = jnp.sum(out, axis=1)                # [B, T, d_v]
            s = jnp.mean(u, axis=1)                 # [B, d_v]
            gate = s @ sh["kernel"].astype(s.dtype) + \
                sh["bias"].astype(s.dtype)
            gate = gate.reshape(b, self.n_head, self.d_v)
            gate = nn.softmax(gate.astype(jnp.float32), axis=1)
            out = out * gate.astype(out.dtype)[:, :, None, :]
            out = jnp.sum(out, axis=1)              # [B, lq, d_v]
        else:
            out = out.transpose(0, 2, 1, 3).reshape(b, lq, -1)
        return out_proj_ln(out), attn

    def _tp_forward(self, q, k, v, mask, wq, wk, wv, sh, out_proj_ln, *,
                    deterministic: bool):
        """Head-sharded attention over the `tp_axis` mesh axis.

        Each shard computes n_head/tp_size heads from block-slices of the
        replicated params (so out-of-block param grads are zero and a psum
        over tp_axis reconstructs the full gradient — parallel/tp.py).  The
        SHBlock gate softmax runs over ALL heads via pmax/psum; the collapsed
        [B, T, d_v] head sum is psum'd, after which fc/dropout/residual/LN
        are computed replicated (their grads are identical across shards).
        """
        tp, axis = self.tp_size, self.tp_axis
        assert self.n_head % tp == 0, (self.n_head, tp)
        n_loc = self.n_head // tp
        idx = jax.lax.axis_index(axis)
        dt = self.dtype

        from ait_tpu.parallel.tp import replicate_for_tp, tp_allreduce

        def head_slice(w, d):
            wf = w.astype(dt).reshape(w.shape[0], self.n_head, d)
            return jax.lax.dynamic_slice_in_dim(wf, idx * n_loc, n_loc, 1)

        # Megatron 'f': the projection inputs are replicated, but each
        # shard's backward only carries its own heads' cotangent — psum it
        # (the residual path stays unwrapped: its cotangent is already full)
        qi = replicate_for_tp(q.astype(dt), axis)
        ki = replicate_for_tp(k.astype(dt), axis)
        vi = replicate_for_tp(v.astype(dt), axis)
        qh = jnp.einsum("btd,dhk->bhtk", qi, head_slice(wq, self.d_k))
        kh = jnp.einsum("btd,dhk->bhtk", ki, head_slice(wk, self.d_k))
        vh = jnp.einsum("btd,dhk->bhtk", vi, head_slice(wv, self.d_v))

        drop = None
        if not deterministic and self.dropout > 0.0:
            # per-shard independent masks (these act on the shard-local
            # heads); the out-proj dropout inside out_proj_ln uses the
            # UNFOLDED stream so its mask — applied to a replicated tensor —
            # is identical on every shard, keeping grads consistent
            r = jax.random.fold_in(self.make_rng("dropout"), idx)
            keep = 1.0 - self.dropout

            def drop(attn):
                m = jax.random.bernoulli(r, keep, attn.shape)
                return jnp.where(m, attn / keep, 0.0)

        hmask = mask[:, None] if mask is not None else None
        out, _ = scaled_dot_attention(
            qh, kh, vh, temperature=self.d_k ** 0.5, mask=hmask,
            dist=self.dist, dropout=drop)             # [B, n_loc, T, d_v]

        # SHBlock gate over ALL heads (SubLayers.py:9-39): the gate input is
        # the head-sum pooled over tokens — psum the shard-partial sum.
        # `s` is replicated but feeds SHARD-LOCAL gate logits, so it crosses
        # back into sliced compute: wrap with replicate_for_tp so its
        # cotangent (shard-partial, one slice of heads each) is psum'd back
        # to the full derivative before flowing into the head sum.
        s = replicate_for_tp(
            tp_allreduce(jnp.mean(jnp.sum(out, axis=1), axis=1), axis), axis)
        skk = sh["kernel"].astype(s.dtype).reshape(
            self.d_v, self.n_head, self.d_v)
        skk = jax.lax.dynamic_slice_in_dim(skk, idx * n_loc, n_loc, 1)
        skb = sh["bias"].astype(s.dtype).reshape(self.n_head, self.d_v)
        skb = jax.lax.dynamic_slice_in_dim(skb, idx * n_loc, n_loc, 0)
        logits = (jnp.einsum("bd,dhe->bhe", s, skk) + skb).astype(jnp.float32)
        # stability shift only — mathematically gradient-free; pmax has no
        # AD rule, so take the max over an all_gather (tiny: [tp, B, 1, d_v])
        # of the stopped per-shard maxima
        gmax = jnp.max(jax.lax.all_gather(
            jax.lax.stop_gradient(jnp.max(logits, axis=1, keepdims=True)),
            axis), axis=0)
        e = jnp.exp(logits - gmax)
        # same boundary situation for the softmax denominator: replicated
        # value consumed by every shard's local gates
        denom = replicate_for_tp(
            tp_allreduce(jnp.sum(e, axis=1, keepdims=True), axis), axis)
        gate = e / denom

        out = jnp.sum(out * gate.astype(out.dtype)[:, :, None, :], axis=1)
        out = tp_allreduce(out, axis)                 # [B, T, d_v] full
        return out_proj_ln(out), None

    # ---- sequence parallelism (inference; parallel/sp.py) ---------------

    def _sp_slice(self, x):
        """This shard's padded token block of a replicated [B, T, D] input.

        Returns (local [B, Tp, D], valid [Tp] bool) with Tp = ceil(T/S)."""
        axis = self.sp_axis
        s = jax.lax.axis_size(axis)
        idx = jax.lax.axis_index(axis)
        t = x.shape[1]
        tp_len = -(-t // s)
        xpad = jnp.pad(x, ((0, 0), (0, tp_len * s - t), (0, 0)))
        local = jax.lax.dynamic_slice_in_dim(xpad, idx * tp_len, tp_len, 1)
        valid = (jnp.arange(tp_len) + idx * tp_len) < t
        return local, valid

    def _sp_proj(self, x, w, d):
        y = x.astype(self.dtype) @ w.astype(self.dtype)
        return y.reshape(x.shape[0], x.shape[1], self.n_head, d).transpose(
            0, 2, 1, 3)

    def _sp_kv_forward(self, q, k, v, wq, wk, wv, sh, out_proj_ln):
        """K/V tokens sharded over sp_axis (image tokens as KEYS — i2q).

        Each shard projects only its token block; the global softmax is
        reconstructed exactly by seq_parallel_attention's three collectives.
        Everything after the attention (SH gate, out-proj, residual, LN)
        sees replicated tensors and runs locally."""
        from ait_tpu.parallel.sp import seq_parallel_attention

        b, lq = q.shape[0], q.shape[1]
        k_loc, valid = self._sp_slice(k)
        v_loc = k_loc if v is k else self._sp_slice(v)[0]
        qh = self._sp_proj(q, wq, self.d_k)           # [B, H, Tq, dk]
        kh = self._sp_proj(k_loc, wk, self.d_k)       # [B, H, Tp, dk]
        vh = self._sp_proj(v_loc, wv, self.d_v)
        mask_shard = jnp.broadcast_to(valid[None, None, None, :],
                                      (b, self.n_head, lq, valid.shape[0]))
        out = seq_parallel_attention(
            qh, kh, vh, self.sp_axis, scale=1.0 / self.d_k ** 0.5,
            mask_shard=mask_shard)                    # [B, H, Tq, d_v] repl.
        out = out.astype(self.dtype)

        # SH gate on replicated tensors — identical math to the jnp branch
        u = jnp.sum(out, axis=1)
        s_vec = jnp.mean(u, axis=1)
        gate = s_vec @ sh["kernel"].astype(s_vec.dtype) + \
            sh["bias"].astype(s_vec.dtype)
        gate = gate.reshape(b, self.n_head, self.d_v)
        gate = nn.softmax(gate.astype(jnp.float32), axis=1)
        out = jnp.sum(out * gate.astype(out.dtype)[:, :, None, :], axis=1)
        return out_proj_ln(out), None

    def _sp_q_forward(self, q, k, v, wq, wk, wv, sh, ln, fc):
        """Query tokens sharded over sp_axis (image tokens as QUERIES — q2i).

        Row-parallel: each shard computes attention/gating/out-proj/LN for
        its token block against the full (replicated, short) K/V; the SH
        gate's token mean is the one cross-shard reduction; output rows are
        all-gathered back to the full sequence at the end."""
        axis = self.sp_axis
        from ait_tpu.parallel.tp import tp_allreduce

        b, t = q.shape[0], q.shape[1]
        q_loc, valid = self._sp_slice(q)              # [B, Tp, D]
        qh = self._sp_proj(q_loc, wq, self.d_k)
        kh = self._sp_proj(k, wk, self.d_k)
        vh = self._sp_proj(v, wv, self.d_v)
        out, _ = scaled_dot_attention(
            qh, kh, vh, temperature=self.d_k ** 0.5,
            dist="softmax")                           # [B, H, Tp, d_v]

        # SH gate input: mean over ALL T real tokens = psum of the local
        # valid-row sums / T (pad rows hold garbage attention outputs)
        u = jnp.sum(out, axis=1)                      # [B, Tp, d_v]
        u = jnp.where(valid[None, :, None], u, 0.0)
        s_vec = tp_allreduce(jnp.sum(u, axis=1), axis) / t
        gate = s_vec @ sh["kernel"].astype(s_vec.dtype) + \
            sh["bias"].astype(s_vec.dtype)
        gate = gate.reshape(b, self.n_head, self.d_v)
        gate = nn.softmax(gate.astype(jnp.float32), axis=1)
        out = jnp.sum(out * gate.astype(out.dtype)[:, :, None, :], axis=1)

        # local out-proj + residual + post-LN on this shard's rows
        # (same math as out_proj_ln, with the LOCAL residual rows)
        out = out @ fc.astype(out.dtype)
        out = out + q_loc.astype(out.dtype)
        outf = out.astype(jnp.float32)
        mu = jnp.mean(outf, axis=-1, keepdims=True)
        var = jnp.mean((outf - mu) ** 2, axis=-1, keepdims=True)
        outf = (outf - mu) * jax.lax.rsqrt(var + 1e-6) * ln["scale"] + \
            ln["bias"]
        out = outf.astype(self.dtype)

        # rows home: [S, B, Tp, D] -> [B, S*Tp, D] -> drop the pad tail
        full = jax.lax.all_gather(out, axis)
        full = full.transpose(1, 0, 2, 3).reshape(b, -1, out.shape[-1])
        return full[:, :t], None


class PositionwiseFeedForward(nn.Module):
    """Post-LN FFN (SubLayers.py:167-187).

    On TPU the whole block (w1/relu/w2/dropout/residual/LN) dispatches to
    one fused Mosaic kernel with a fused recompute backward
    (ops/pallas_ffn.py); dropout is in-kernel pltpu PRNG.  Elsewhere the
    flax composition below is the reference math.
    """

    d_in: int
    d_hid: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    kernel_init: Any = xavier_uniform()
    use_pallas: bool = True
    # Megatron column/row-parallel FFN over the `tp_axis` mesh axis
    # (see MultiHeadAttention.tp_size / parallel/tp.py)
    tp_size: int = 1
    tp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.use_pallas or self.tp_size > 1:
            from ait_tpu.ops.pallas_ffn import (ffn_reference, fused_ffn)

            w1 = _P((("kernel", (x.shape[-1], self.d_hid),
                      self.kernel_init),
                     ("bias", (self.d_hid,), nn.initializers.zeros)),
                    name="w_1")()
            w2 = _P((("kernel", (self.d_hid, self.d_in), self.kernel_init),
                     ("bias", (self.d_in,), nn.initializers.zeros)),
                    name="w_2")()
            ln = _P((("scale", (self.d_in,), nn.initializers.ones),
                     ("bias", (self.d_in,), nn.initializers.zeros)),
                    name="LayerNorm_0")()
            shape = x.shape
            dt = self.dtype
            flat = x.reshape(-1, shape[-1]).astype(dt)

            if self.tp_size > 1:
                # column-parallel w1 / row-parallel w2: each shard computes
                # d_hid/tp hidden units from block-slices of the replicated
                # params, one psum recombines the output (Megatron-style;
                # grads reduced by parallel/tp.py)
                tp, axis = self.tp_size, self.tp_axis
                assert self.d_hid % tp == 0, (self.d_hid, tp)
                h_loc = self.d_hid // tp
                idx = jax.lax.axis_index(axis)
                w1k = jax.lax.dynamic_slice_in_dim(
                    w1["kernel"].astype(dt), idx * h_loc, h_loc, 1)
                w1b = jax.lax.dynamic_slice_in_dim(
                    w1["bias"], idx * h_loc, h_loc, 0)
                w2k = jax.lax.dynamic_slice_in_dim(
                    w2["kernel"].astype(dt), idx * h_loc, h_loc, 0)
                from ait_tpu.parallel.tp import (replicate_for_tp,
                                                 tp_allreduce)

                # Megatron 'f' on the matmul input (residual path unwrapped)
                y = nn.relu(replicate_for_tp(flat, axis) @ w1k +
                            w1b.astype(dt))
                z = tp_allreduce(y @ w2k, axis) + w2["bias"].astype(dt)
                # dropout mask drawn from the unfolded stream: identical on
                # every shard (z is replicated after the psum)
                z = nn.Dropout(self.dropout,
                               deterministic=deterministic)(z)
                outf = (z + flat).astype(jnp.float32)
                mu = jnp.mean(outf, axis=-1, keepdims=True)
                var = jnp.mean((outf - mu) ** 2, axis=-1, keepdims=True)
                outf = (outf - mu) * jax.lax.rsqrt(var + 1e-6) * \
                    ln["scale"] + ln["bias"]
                return outf.astype(dt).reshape(shape)

            train_drop = (not deterministic) and self.dropout > 0.0
            keep_prob = 1.0 - self.dropout if train_drop else 1.0
            if train_drop:
                r0, r1 = jax.random.split(self.make_rng("dropout"))
                seed = jax.random.randint(r0, (2,), -2 ** 31, 2 ** 31 - 1,
                                          jnp.int32)
                # bernoulli mask for the non-TPU reference branch only
                # (DCE'd on TPU)
                keep = jax.random.bernoulli(
                    r1, keep_prob, flat.shape).astype(jnp.float32)
            else:
                seed = jnp.zeros((2,), jnp.int32)
                keep = None
            args = (flat, w1["kernel"].astype(dt), w1["bias"],
                    w2["kernel"].astype(dt), w2["bias"],
                    ln["scale"], ln["bias"])

            def kernel_branch():
                return fused_ffn(*args, seed, keep_prob)

            def ref_branch():
                return ffn_reference(*args, keep=keep,
                                     keep_prob=keep_prob)

            out = jax.lax.platform_dependent(tpu=kernel_branch,
                                             default=ref_branch)
            return out.reshape(shape)

        residual = x
        y = nn.Dense(self.d_hid, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="w_1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.d_in, dtype=self.dtype,
                     kernel_init=self.kernel_init, name="w_2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = y + residual
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(y)
