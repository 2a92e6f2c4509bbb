"""Pipeline parallelism: GPipe-style microbatch pipelining over a 'stage'
mesh axis.

The reference has no model parallelism of any kind; this (with
parallel/tp.py) is the scaling story for configs that outgrow one chip:
shard a chain of stages over devices and stream M microbatches through
them, overlapping stage s on microbatch m with stage s+1 on microbatch
m-1.  Bubble fraction is (S-1)/(M+S-1), so M >> S amortizes it.

TPU-first mechanics (the "How to Scale Your Model" pipelining recipe):
one `shard_map` over the 'stage' axis; each device holds ITS stage's
params (leaves stacked [S, ...] and sharded on dim 0, so per-device
memory is 1/S of the model); a `lax.scan` runs M+S-1 ticks; between
ticks activations hop stage s -> s+1 with ONE `lax.ppermute` (a
neighbor-exchange that rides ICI at line rate, no all-gather anywhere).
Stage 0 feeds microbatch t at tick t; stage S-1 emits microbatch t at
tick t+S-1.  The whole schedule is differentiable: scan + ppermute have
exact transposes (the backward pass is automatically the reverse
pipeline — ppermute's transpose is the reverse permutation).

All stages must share one signature `fn(stage_params, x) -> y` with
x/y of one fixed pytree structure (pad/project at the model level where
a real seam changes shapes — standard GPipe practice).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ait_tpu.parallel.sharded import shard_map


def stack_stage_params(per_stage_params) -> Any:
    """[params_stage0, params_stage1, ...] -> one tree with [S, ...] leaves.

    All stages must share one param structure (same-shaped layers — the
    homogeneous-block case pipelining is built for).
    """
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                  *per_stage_params)


def shard_stage_params(stacked, mesh: Mesh, axis: str = "stage"):
    """Place [S, ...] leaves with dim 0 sharded over the stage axis —
    device s holds ONLY stage s's slice (1/S of the model per device)."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis))), stacked)


def make_pipeline_apply(fn: Callable, mesh: Mesh, n_microbatches: int,
                        axis: str = "stage") -> Callable:
    """pipelined(stacked_params, x) -> y.

    `fn(stage_params, x) -> y`: one stage's computation, same x/y pytree
    structure for every stage.  `stacked_params`: [S, ...] leaves sharded
    over `axis` (see shard_stage_params).  `x`: [M, ...] leaves — M
    microbatches, replicated over `axis` (only stage 0 reads them; XLA
    keeps the stream local after DCE).  Returns [M, ...]: stage S-1's
    outputs in microbatch order.
    """
    n_stages = int(mesh.shape[axis])
    m = n_microbatches
    fwd = [(s, (s + 1) % n_stages) for s in range(n_stages)]

    def local(params, xs):
        # inside shard_map: params [1, ...] = my stage's slice; xs [M, ...]
        p_me = jax.tree_util.tree_map(lambda a: a[0], params)
        stage = jax.lax.axis_index(axis)
        zero = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), xs)

        def tick(carry, t):
            recv = carry
            # stage 0 consumes microbatch t from the stream (t >= M ticks
            # drain the pipe; feed zeros, their outputs are masked off)
            x_t = jax.tree_util.tree_map(
                lambda a, z: jnp.where(t < m, a[jnp.minimum(t, m - 1)], z),
                xs, zero)
            inp = jax.tree_util.tree_map(
                lambda a, b: jnp.where(stage == 0, a, b), x_t, recv)
            out = fn(p_me, inp)
            # hop s -> s+1 for next tick (the wrap S-1 -> 0 carries drained
            # garbage; stage 0 overwrites it with the stream)
            nxt = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, axis, fwd), out)
            # stage S-1's output at tick t is microbatch t-(S-1)
            emit = jax.tree_util.tree_map(
                lambda a, z: jnp.where(stage == n_stages - 1, a, z), out,
                zero)
            return nxt, emit

        _, emitted = jax.lax.scan(tick, zero,
                                  jnp.arange(m + n_stages - 1))
        # keep the last M ticks = microbatches 0..M-1 from the last stage;
        # psum broadcasts them off stage S-1 (zeros elsewhere)
        out = jax.tree_util.tree_map(lambda a: a[n_stages - 1:], emitted)
        return jax.tree_util.tree_map(lambda a: jax.lax.psum(a, axis), out)

    return shard_map(local, mesh, in_specs=(P(axis), P()),
                     out_specs=P())
