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

The optional GRU/LSTM "contextual relation" branch (`:277-354`) is off in every
shipped config (`with_contextual_relation=False`, `:234`) and is not rebuilt.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
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
    def __call__(self, x):
        n1, n2, n3, _ = STAGES[self.variant]
        w = _Conv1Kernel(name="conv1")()          # [7, 7, 3, 64]
        x = x.astype(self.dtype)
        if self.s2d_stem and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
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
        x = ResNetStage(64, n1, 1, self.dtype, name="layer1")(x)
        x = ResNetStage(128, n2, 2, self.dtype, name="layer2")(x)
        x = ResNetStage(256, n3, 2, self.dtype, name="layer3")(x)
        return x


class ResNetTop(nn.Module):
    """layer4 + global spatial mean: [N, h, w, 1024] -> [N, 2048].

    The reference's `_head_to_tail` (resnet_sys_transformer_sk_dilat.py:482-491).
    """

    variant: str = "resnet50"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        _, _, _, n4 = STAGES[self.variant]
        x = ResNetStage(512, n4, 2, self.dtype, name="layer4")(x)
        return jnp.mean(x, axis=(1, 2))
