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
The whole schedule is differentiable: scan + ppermute have exact
transposes (the backward pass is automatically the reverse pipeline —
ppermute's transpose is the reverse permutation).

Memory story (per device): the microbatch STREAM is sharded over the
stage axis in contiguous blocks — M/S input microbatches and M/S output
microbatches per device, plus two single-microbatch ring slots and the
in-flight activation.  Nothing is replicated and nothing is broadcast:

  * inputs ride a DELIVERY RING rotating one hop toward stage 0 per
    tick, with the invariant "the slot at device d on tick t carries
    microbatch t+d": each device overwrites its slot with its own local
    copy whenever the scheduled microbatch lies in its block (that IS
    the value the invariant demands, so the overwrite is exact), and
    stage 0 consumes microbatch t right on time;
  * outputs ride a RETURN RING in the same direction: stage S-1 injects
    each finished microbatch and the slot passing device d on tick t
    carries microbatch t-2S+2+d; the home device (micro // (M/S))
    captures it as it passes.  (The previous design emitted a full
    [M, ...] buffer on every device and psum-broadcast it — an
    output-sized all-reduce per call; both are gone.)

Per tick that is 3 single-microbatch ppermutes (activation hop, delivery
ring, return ring) — same order of ICI traffic as the activation hops
alone, and every transfer is a neighbor exchange.  Both rings are
branch-free jnp.where selects, so the program stays SPMD-uniform.

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
    microbatches; inside the pipeline the stream is sharded over `axis`
    (M/S contiguous microbatches per device, module docstring).  Returns
    [M, ...]: stage S-1's outputs in microbatch order, sharded the same
    way.
    """
    n_stages = int(mesh.shape[axis])
    m = n_microbatches
    # pad the stream to a multiple of S so every device holds the same
    # number of microbatches; padded (zero) microbatches are dropped at exit
    mb = -(-m // n_stages)
    m_pad = mb * n_stages
    fwd = [(s, (s + 1) % n_stages) for s in range(n_stages)]
    back = [(s, (s - 1) % n_stages) for s in range(n_stages)]
    s1 = n_stages - 1

    def local(params, xs):
        # inside shard_map: params [1, ...] = my stage's slice;
        # xs [mb, ...] = my contiguous block of the stream
        p_me = jax.tree_util.tree_map(lambda a: a[0], params)
        stage = jax.lax.axis_index(axis)
        zero = jax.tree_util.tree_map(
            lambda a: jnp.zeros(a.shape[1:], a.dtype), xs)

        def rot(tree):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, axis, back), tree)

        # last capture lands at tick m_pad + S - 2 (the micro m_pad-1
        # corner), so M+S-1 ticks — the classic GPipe schedule length —
        # cover the whole stream
        def step(carry, t):
            recv, inflight, outflight, out_buf = carry

            # ---- delivery ring: invariant "device d holds micro t+d".
            # When that micro is in my block, my local copy is by
            # definition the right value — overwrite (this is both the
            # injection and a no-op refresh); otherwise take the rotation.
            din = t + stage
            own_in = (din // mb) == stage
            slot_in = jnp.clip(din - stage * mb, 0, mb - 1)
            mine = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(a, slot_in, 0,
                                                       keepdims=False), xs)
            inflight = jax.tree_util.tree_map(
                lambda a, b: jnp.where(own_in, a, b), mine, rot(inflight))

            # stage 0 consumes the ring head; everyone else their
            # neighbor's activation from last tick
            inp = jax.tree_util.tree_map(
                lambda a, b: jnp.where(stage == 0, a, b), inflight, recv)
            out = fn(p_me, inp)
            recv = jax.tree_util.tree_map(
                lambda a: jax.lax.ppermute(a, axis, fwd), out)

            # ---- return ring: stage S-1 injects its finished microbatch
            # (micro t-(S-1)), everyone else passes the ring along ----
            outflight = jax.tree_util.tree_map(
                lambda o, r: jnp.where(stage == s1, o, r), out,
                rot(outflight))

            # capture: the slot passing device d on tick t carries micro
            # t-2S+2+d; capture it when this device is its home block
            micro = t - (2 * n_stages - 2) + stage
            slot = jnp.clip(micro - stage * mb, 0, mb - 1)
            valid = ((micro >= 0) & (micro < m_pad) &
                     ((micro // mb) == stage))

            def store(buf, v):
                cur = jax.lax.dynamic_index_in_dim(buf, slot, 0,
                                                   keepdims=False)
                newv = jnp.where(valid, v, cur)
                return jax.lax.dynamic_update_index_in_dim(buf, newv, slot, 0)

            out_buf = jax.tree_util.tree_map(store, out_buf, outflight)
            return (recv, inflight, outflight, out_buf), None

        out_buf0 = jax.tree_util.tree_map(
            lambda z: jnp.zeros((mb,) + z.shape, z.dtype), zero)
        carry0 = (zero, zero, zero, out_buf0)
        (_, _, _, out_buf), _ = jax.lax.scan(
            step, carry0, jnp.arange(m_pad + n_stages - 1))
        return out_buf

    piped = shard_map(local, mesh, in_specs=(P(axis), P(axis)),
                      out_specs=P(axis))

    def pipelined(stacked_params, x):
        pad = m_pad - m
        if pad:
            x = jax.tree_util.tree_map(
                lambda a: jnp.concatenate(
                    [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)]), x)
        y = piped(stacked_params, x)
        if pad:
            y = jax.tree_util.tree_map(lambda a: a[:m], y)
        return y

    return pipelined
