"""Selective-kernel channel attention (SKNet), both 'faithful' and 'fixed'.

Reference: blocks_coatt_transformer_sk.py:915-998.  SKBlock runs two grouped
convs (k=1 and k=3, groups=8, +ReLU), sums the branches, squeezes (GAP -> FC
bottleneck -> per-branch softmax channel gate `a`) — and then computes
`v = f * f` instead of `f * a` (`:981`), i.e. the gate is dead and the output
is the branch-wise square, summed.  `gate='faithful'` reproduces that bug for
checkpoint/AP parity; `gate='fixed'` applies the computed gate.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class SKBlock(nn.Module):
    channels: int
    reduction: int = 16
    groups: int = 8
    gate: str = "faithful"  # 'faithful' (f*f) | 'fixed' (f*a)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernels = (1, 3)
        c = self.channels
        kaiming = nn.initializers.variance_scaling(2.0, "fan_out",
                                                   "truncated_normal")
        branches = []
        for i, k in enumerate(kernels):
            y = nn.Conv(c, (k, k), padding=k // 2,
                        feature_group_count=self.groups, dtype=self.dtype,
                        kernel_init=kaiming, name=f"conv{i}")(x)
            branches.append(nn.relu(y))
        f = jnp.stack(branches, axis=1)          # [B, ns, H, W, C]

        if self.gate == "faithful":
            v = f * f
        elif self.gate == "fixed":
            u = jnp.sum(f, axis=1)               # [B, H, W, C]
            s = jnp.mean(u, axis=(1, 2))         # [B, C]
            z = nn.Dense(c // self.reduction, dtype=self.dtype, name="fc")(s)
            a = nn.Dense(c * len(kernels), dtype=self.dtype, name="sk")(z)
            a = a.reshape(-1, len(kernels), c)
            a = nn.softmax(a.astype(jnp.float32), axis=1).astype(f.dtype)
            v = f * a[:, :, None, None, :]
        else:
            raise ValueError(self.gate)
        return jnp.sum(v, axis=1)


class SKNet(nn.Module):
    """Independent SKBlocks on proposal & query streams (blocks:986-998)."""

    channels: int = 1024
    reduction: int = 16
    gate: str = "faithful"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_props, x_query):
        f_props = SKBlock(self.channels, self.reduction, gate=self.gate,
                          dtype=self.dtype, name="sk_props")(x_props)
        f_query = SKBlock(self.channels, self.reduction, gate=self.gate,
                          dtype=self.dtype, name="sk_query")(x_query)
        return f_props, f_query
