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

from typing import Any, Sequence

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

    @nn.compact
    def __call__(self, x):
        n1, n2, n3, _ = STAGES[self.variant]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
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
