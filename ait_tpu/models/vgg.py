"""VGG16 backbone variant.

The reference ships a VGG16 path (lib/model/faster_rcnn/vgg16.py) that is
*broken*: its ctor does not accept the `num_K` argument every entry point
passes (vgg16.py:20 vs trainval_net_voc.py:271-272), so `--net vgg16` raises
TypeError.  This is the repaired, working equivalent wired into the AIT
pipeline: conv1_1..conv5_3 (stride 16, 512 channels) as the base — configs
using it must set `model.channels: 512` — and a 2-layer 4096-d MLP head in
place of ResNet's layer4+GAP (mirroring vgg16.py:46-59's use of the
classifier as `_head_to_tail`).

Reference recipe details reproduced here:
  * layers before conv3 are FROZEN (vgg16.py:40-42 sets requires_grad=False
    on RCNN_base[0..9] = conv1_1..conv2_2): `frozen_blocks=2` stop_gradients
    those kernels/biases, and the optimizer labels them 'frozen';
  * the head is torchvision's classifier[:-1] = fc6/ReLU/Dropout/fc7/ReLU/
    Dropout (vgg16.py:35), so VGGTop carries the two 0.5 dropouts;
  * pretrained weights come from vgg16_caffe.pth in torchvision key layout
    (vgg16.py:31-33) — see ait_tpu.convert.convert_vgg_backbone.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

Dtype = Any

# channels per conv block; each block followed by 2x2 maxpool except the last
_BLOCKS = ((64, 64), (128, 128), (256, 256, 256),
           (512, 512, 512), (512, 512, 512))


class _FrozenConv(nn.Module):
    """3x3 conv whose params are stop_gradient'ed (requires_grad=False
    equivalent; the optimizer additionally masks these — optim.param_label).

    Param names/init match nn.Conv so checkpoint conversion and the
    frozen/trainable switch are layout-transparent.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros,
                       (self.features,), jnp.float32)
        k = jax.lax.stop_gradient(k).astype(self.dtype)
        b = jax.lax.stop_gradient(b).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class VGGBackbone(nn.Module):
    """[B, H, W, 3] -> [B, H/16, W/16, 512] (conv5_3, no final pool)."""

    dtype: Dtype = jnp.float32
    frozen_blocks: int = 2   # blocks 1-2 ("fix the layers before conv3")

    @nn.compact
    def __call__(self, x):
        for bi, widths in enumerate(_BLOCKS):
            frozen = bi < self.frozen_blocks
            for ci, w in enumerate(widths):
                name = f"conv{bi + 1}_{ci + 1}"
                if frozen:
                    x = _FrozenConv(w, dtype=self.dtype, name=name)(x)
                else:
                    x = nn.Conv(w, (3, 3), padding=1, dtype=self.dtype,
                                name=name)(x)
                x = nn.relu(x)
            if bi < len(_BLOCKS) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class VGGTop(nn.Module):
    """[N, h, w, 512] -> [N, 4096] classifier-style head (fc6/fc7 + the
    torchvision classifier's two 0.5 dropouts, vgg16.py:35)."""

    dtype: Dtype = jnp.float32
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc6")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(4096, dtype=self.dtype, name="fc7")(x))
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x
