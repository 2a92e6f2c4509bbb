"""VGG16 backbone variant.

The reference ships a VGG16 path (lib/model/faster_rcnn/vgg16.py) that is
*broken*: its ctor does not accept the `num_K` argument every entry point
passes (vgg16.py:20 vs trainval_net_voc.py:271-272), so `--net vgg16` raises
TypeError.  This is the repaired, working equivalent wired into the AIT
pipeline: conv1_1..conv5_3 (stride 16, 512 channels) as the base — configs
using it must set `model.channels: 512` — and a 2-layer 4096-d MLP head in
place of ResNet's layer4+GAP (mirroring vgg16.py:46-59's use of the
classifier as `_head_to_tail`).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# channels per conv block; each block followed by 2x2 maxpool except the last
_BLOCKS = ((64, 64), (128, 128), (256, 256, 256),
           (512, 512, 512), (512, 512, 512))


class VGGBackbone(nn.Module):
    """[B, H, W, 3] -> [B, H/16, W/16, 512] (conv5_3, no final pool)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for bi, widths in enumerate(_BLOCKS):
            for ci, w in enumerate(widths):
                x = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{bi + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            if bi < len(_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class VGGTop(nn.Module):
    """[N, h, w, 512] -> [N, 4096] classifier-style head."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        return x
