"""Caffe-style ResNet backbone, NHWC, frozen BN.

Semantics pinned to the reference definition
(lib/model/faster_rcnn/resnet_sys_transformer_sk_dilat.py):
  * Bottleneck puts the stride on conv1 (1x1), not conv2 — Caffe convention
    (`:78-81` "# change");
  * stem maxpool is k=3 s=2 padding=0 ceil_mode=True (`:120`);
  * backbone = stem + layer1..3 -> C=1024 stride-16 features (`:253-265`);
  * top = layer4 (stride 2) + global spatial mean -> 2048-d (`:422,482-491`);
  * every BatchNorm is frozen (params + stats) for the entire run
    (`:435-441,474-480`) — here a constant affine (FrozenBatchNorm);
  * stem conv/bn are excluded from the optimizer (`:260-261`), handled by the
    param mask in train/optim.py.

The optional GRU/LSTM "contextual relation" branch (`:277-354`) is rebuilt as
`ContextualRelation` (off in every shipped config, `:234`; enable with
cfg.model.with_contextual_relation).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from ait_tpu.models.layers import FrozenBatchNorm, max_pool_ceil

Dtype = Any

# layer counts per variant
STAGES = {
    "resnet50": (3, 4, 6, 3),
    "resnet101": (3, 4, 23, 3),
    "resnet152": (3, 8, 36, 3),
}


class _Conv1Kernel(nn.Module):
    """Raw stem kernel (path `conv1/kernel`, same init as nn.Conv)."""

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (7, 7, 3, 64))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = FrozenBatchNorm(self.planes, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = FrozenBatchNorm(self.planes, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = FrozenBatchNorm(self.planes * 4, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = FrozenBatchNorm(self.planes * 4,
                                       name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        needs_ds = self.stride != 1 or x.shape[-1] != self.planes * 4
        x = Bottleneck(self.planes, self.stride, needs_ds, self.dtype,
                       name="block0")(x)
        for i in range(1, self.blocks):
            x = Bottleneck(self.planes, dtype=self.dtype, name=f"block{i}")(x)
        return x


class ResNetBackbone(nn.Module):
    """stem + layer1-3: [B, H, W, 3] -> [B, H/16, W/16, 1024]."""

    variant: str = "resnet50"
    dtype: Dtype = jnp.float32
    s2d_stem: bool = True

    @nn.compact
    def __call__(self, x, return_stages: bool = False):
        n1, n2, n3, _ = STAGES[self.variant]
        # frozen stem (optimizer-masked); stop_gradient prunes its dW
        # convolution from the backward
        w = jax.lax.stop_gradient(_Conv1Kernel(name="conv1")())  # [7,7,3,64]
        x = x.astype(self.dtype)
        if x.shape[-1] == 12:
            # input already space-to-depth'd on the host (loader host_s2d;
            # same regroup as below, so features are bitwise identical)
            w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
            w4 = w8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
            w4 = w4.reshape(4, 4, 12, 64).astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                x, w4, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        elif self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # space-to-depth rewrite of conv 7x7/2: mathematically exact
            # (the 7x7 kernel zero-pads to 8x8 and regroups into 4x4 over
            # 2x2x3=12 input planes), but the contraction depth grows
            # 147 -> 768, which the 128-lane MXU runs near-dense instead of
            # at 3/128 occupancy — the classic TPU ResNet stem rewrite.
            b, h, wd, _ = x.shape
            y = x.reshape(b, h // 2, 2, wd // 2, 2, 3)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 12)
            w8 = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
            w4 = w8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
            w4 = w4.reshape(4, 4, 12, 64).astype(self.dtype)
            x = jax.lax.conv_general_dilated(
                y, w4, (1, 1), ((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        else:
            x = jax.lax.conv_general_dilated(
                x, w.astype(self.dtype), (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool_ceil(x, 3, 2)
        x1 = ResNetStage(64, n1, 1, self.dtype, name="layer1")(x)
        x2 = ResNetStage(128, n2, 2, self.dtype, name="layer2")(x1)
        x3 = ResNetStage(256, n3, 2, self.dtype, name="layer3")(x2)
        if return_stages:
            return x3, (x1, x2, x3)
        return x3


class _RNNDirection(nn.Module):
    """One direction of a torch-layout GRU/LSTM over a short static sequence.

    Gate packing follows torch (GRU: r,z,n; LSTM: i,f,g,o) so released
    checkpoints convert as plain transposes.  The sequence is length 3 and
    static, so the time loop unrolls — no lax.scan needed.
    """

    hidden: int
    method: str = "GRU"     # GRU | LSTM
    reverse: bool = False

    @nn.compact
    def __call__(self, xs):                       # [B, S, D] float32
        d = xs.shape[-1]
        g = 3 if self.method == "GRU" else 4
        k = 1.0 / np.sqrt(self.hidden)

        def unif(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -k, k)

        w_ih = self.param("w_ih", unif, (d, g * self.hidden))
        w_hh = self.param("w_hh", unif, (self.hidden, g * self.hidden))
        b_ih = self.param("b_ih", unif, (g * self.hidden,))
        b_hh = self.param("b_hh", unif, (g * self.hidden,))

        b = xs.shape[0]
        h = jnp.zeros((b, self.hidden), xs.dtype)
        c = jnp.zeros((b, self.hidden), xs.dtype)
        steps = range(xs.shape[1])
        outs = [None] * xs.shape[1]
        for t in (reversed(steps) if self.reverse else steps):
            gi = xs[:, t, :] @ w_ih + b_ih
            gh = h @ w_hh + b_hh
            if self.method == "GRU":
                ir, iz, in_ = jnp.split(gi, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(ir + hr)
                z = jax.nn.sigmoid(iz + hz)
                n = jnp.tanh(in_ + r * hn)
                h = (1.0 - z) * n + z * h
            else:
                i, f, g_, o = jnp.split(gi + gh, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g_)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
            outs[t] = h
        return jnp.stack(outs, axis=1)            # [B, S, H]


class ContextualRelation(nn.Module):
    """Recurrent-excitation branch: stage GAPs -> (bi)RNN -> sigmoid scale.

    Rebuild of the reference's optional low->high "contextual relation"
    (resnet_sys_transformer_sk_dilat.py:277-354): layer1/2/3 features are
    1x1-conv embedded to `channels`, globally average-pooled, stacked as a
    length-3 sequence, run through a (bidirectional) GRU or LSTM with hidden
    size channels//reduction; the LAST timestep's output maps through
    fc+sigmoid to a per-channel scale.  The detector multiplies both head
    vectors by the QUERY's scale (faster_rcnn_sys…:256-265; the image's
    scale is computed but unused there — not computed here).
    """

    channels: int = 2048
    reduction: int = 16
    rnn_layers: int = 1
    bidirectional: bool = True
    method: str = "GRU"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, stages):
        seq = []
        for i, x in enumerate(stages):
            x = nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                        name=f"trans{i + 1}")(x)
            seq.append(jnp.mean(x, axis=(1, 2)))
        xs = jnp.stack(seq, axis=1).astype(jnp.float32)   # [B, 3, C]
        hidden = self.channels // self.reduction
        out = xs
        for layer in range(self.rnn_layers):
            fw = _RNNDirection(hidden, self.method,
                               name=f"l{layer}_fw")(out)
            if self.bidirectional:
                bw = _RNNDirection(hidden, self.method, reverse=True,
                                   name=f"l{layer}_bw")(out)
                out = jnp.concatenate([fw, bw], axis=-1)
            else:
                out = fw
        scale = nn.Dense(self.channels, name="fc")(out[:, -1, :])
        return jax.nn.sigmoid(scale)               # [B, channels] float32


class ResNetTop(nn.Module):
    """layer4 + global spatial mean: [N, h, w, 1024] -> [N, 2048].

    The reference's `_head_to_tail` (resnet_sys_transformer_sk_dilat.py:482-491).
    """

    variant: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # deterministic is unused (no dropout here) — the arg keeps the
        # head_to_tail call signature uniform with VGGTop's.
        del deterministic
        _, _, _, n4 = STAGES[self.variant]
        x = ResNetStage(512, n4, 2, self.dtype, name="layer4")(x)
        return jnp.mean(x, axis=(1, 2))


# ---------------------------------------------------------------------------
# Eval-time constant folding
# ---------------------------------------------------------------------------

_BN_OF_CONV = {"conv1": "bn1", "conv2": "bn2", "conv3": "bn3",
               "downsample_conv": "downsample_bn"}


def fold_frozen_bn(params, eps: float = 1e-5):
    """Fold every FrozenBatchNorm into its preceding conv's kernel (EVAL
    path; exact — the BN is a constant affine for the whole run, so
    conv(x; k)*w + b == conv(x; k*w) + b).

    Returns a params copy where each paired conv kernel is scaled by
    w = scale * rsqrt(var + eps) per output channel and the BN params are
    rewritten to compute EXACTLY x + b' (scale=1, var=1-eps with
    (1-eps)+eps == 1.0 in f32 and rsqrt(1)=1, mean=0, bias = b - m*w) —
    the module code is untouched, so the folded tree drops into any eval
    step.  The BN multiply chain (and its bf16 cast churn) disappears from
    the compiled program; the A/B on chip is recorded in PERFORMANCE.md.

    NOT for training: the optimizer treats conv kernels as live params, so
    a folded kernel would train on the scaled parameterization.
    """
    import jax.numpy as jnp

    def walk(d):
        out = {k: (walk(v) if isinstance(v, dict) else v)
               for k, v in d.items()}
        for ck, bk in _BN_OF_CONV.items():
            if not (isinstance(out.get(ck), dict)
                    and isinstance(out.get(bk), dict)):
                continue
            conv, bn = out[ck], out[bk]
            if "kernel" not in conv or "var" not in bn:
                continue
            w = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
            out[ck] = {**conv, "kernel": conv["kernel"] * w}  # [..., O] * [O]
            out[bk] = {"scale": jnp.ones_like(bn["scale"]),
                       "var": jnp.full_like(bn["var"], 1.0 - eps),
                       "mean": jnp.zeros_like(bn["mean"]),
                       "bias": bn["bias"] - bn["mean"] * w}
        return out

    return walk(params)
