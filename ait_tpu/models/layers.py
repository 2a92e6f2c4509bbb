"""Shared building blocks: frozen BN, ceil-mode maxpool, init helpers.

NHWC layout throughout (TPU-native); the reference is NCHW torch.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

Dtype = Any

normal_init = nn.initializers.normal
zeros_init = nn.initializers.zeros
xavier_uniform = nn.initializers.xavier_uniform


# EVAL-time program variant paired with models.resnet.fold_frozen_bn: with
# the BN scale folded into the conv kernels (params-side, exact), every
# FrozenBatchNorm's multiply is x * 1.0 — set this flag so the compiled
# program drops the full-activation multiplies and keeps only the bias
# adds.  Same default-off-global pattern as attention._LONG_SEQ_FUSION;
# NEVER use with unfolded params (the scale would be silently ignored).
BN_BIAS_ONLY = False


class FrozenBatchNorm(nn.Module):
    """BatchNorm that is a constant affine transform.

    The reference freezes every BN's params *and* running stats for the whole
    of training (`set_bn_fix`/`set_bn_eval`, resnet_sys_transformer_sk_dilat.py
    :435-441,474-480), so on TPU it is just `x*w + b` with folded constants.
    The four arrays live in params for checkpoint-conversion parity but are
    masked out of the optimizer (see train/optim.py).
    """

    features: int
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", zeros_init, (self.features,))
        mean = self.param("mean", zeros_init, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        # stop_gradient: the optimizer masks these params anyway (frozen for
        # the whole run), but without it XLA still computes a dscale/dbias
        # reduction over every activation in the backward — ~50 wasted
        # full-tensor reductions per step
        w, b_, m, v = (lax.stop_gradient(t) for t in (scale, bias, mean, var))
        w = w * lax.rsqrt(v + self.eps)
        b = b_ - m * w
        if BN_BIAS_ONLY:
            # fold_frozen_bn'd params: w == 1 bitwise, the multiply is
            # dead — emit only the per-channel bias add
            return x + b.astype(x.dtype)
        return x * w.astype(x.dtype) + b.astype(x.dtype)


def max_pool_ceil(x, window: int, stride: int):
    """Max pool with padding=0 and ceil_mode=True.

    Matches the reference backbone's deviation from stock torchvision
    (resnet_sys_transformer_sk_dilat.py:120: MaxPool2d(3, 2, padding=0,
    ceil_mode=True)).  Ceil mode is realised by right/bottom -inf padding.
    """
    h, w = x.shape[1], x.shape[2]

    def ceil_pad(size):
        out = -(-(size - window) // stride) + 1
        return max((out - 1) * stride + window - size, 0)

    pads = ((0, 0), (0, ceil_pad(h)), (0, ceil_pad(w)), (0, 0))
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        pads,
    )


def sinusoid_table(n_position: int, d_hid: int) -> jnp.ndarray:
    """Sinusoidal positions [n_position, d_hid] (system/Models.py:34-45)."""
    import numpy as np

    pos = np.arange(n_position)[:, None]
    dim = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000.0, 2 * (dim // 2) / d_hid)
    table = np.zeros((n_position, d_hid), np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return jnp.asarray(table)


class ZeroInitGroupNorm(nn.Module):
    """GroupNorm whose affine starts at zero.

    Used by the non-local co-attention's omega/theta output projections so the
    residual branch starts as identity (blocks_coatt_transformer_sk.py:50-58).
    """

    num_groups: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gn = nn.GroupNorm(
            num_groups=self.num_groups,
            epsilon=self.eps,
            scale_init=zeros_init,
            bias_init=zeros_init,
        )
        return gn(x)
