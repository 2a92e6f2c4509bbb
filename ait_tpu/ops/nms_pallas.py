"""Greedy NMS sweep as a single Pallas TPU kernel.

Same algorithm as ops/nms.py::nms_keep_mask (exact sequential-greedy via
tile-wise fixpoint peeling with a compacted survivor buffer), but the whole
batched sweep runs inside ONE Mosaic kernel: the survivor buffer lives in
VMEM scratch across the (batch, tile) grid, the in-tile fixpoint is an
in-kernel while loop (no per-round XLA dispatch), and survivor compaction
is a one-hot matmul instead of a scatter.  The XLA version spends
~7 ms/step at train shapes (B=8, 12000->2000) almost entirely on
while-loop iteration overhead; the kernel removes that.

Mosaic shaping: everything is column-form [T, 1] and reductions that cross
the sublane axis are MXU matmuls against precomputed 0/1 masks (iota
comparisons) — no in-kernel transposes or 1-D ops.

Exactness: identical keep bits to ops.nms.nms_keep_mask for the first
`max_out` survivors of every image (later bits may be under-reported once
the survivor cap is reached — callers take the top `max_out` only).
IoU uses the reference's +1 area convention (lib/model/csrc/cuda/nms.cu:16-19).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_exceeds(a, b, thresh):
    """(IoU(a, b) > thresh) without division, +1 convention: [T, S] bool.

    inter > thresh * union is algebraically IoU > thresh (union >= 1 with
    the +1 convention) and uses only exactly-rounded mul/add/sub — so the
    Mosaic kernel and the XLA path (ops.nms._iou_exceeds) agree bitwise,
    which a divide does not guarantee (Mosaic lowers f32 division to a
    reciprocal approximation)."""
    ax1, ay1, ax2, ay2 = (a[:, i:i + 1] for i in range(4))   # [T, 1]
    bx1, by1, bx2, by2 = (b[:, i:i + 1] for i in range(4))   # [S, 1]
    # [T, S] via dot_general-free broadcasts: row block x col block
    iw = (jnp.minimum(ax2, jnp.transpose(bx2)) -
          jnp.maximum(ax1, jnp.transpose(bx1)) + 1.0)
    ih = (jnp.minimum(ay2, jnp.transpose(by2)) -
          jnp.maximum(ay1, jnp.transpose(by1)) + 1.0)
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_a = (ax2 - ax1 + 1.0) * (ay2 - ay1 + 1.0)           # [T, 1]
    area_b = (bx2 - bx1 + 1.0) * (by2 - by1 + 1.0)           # [S, 1]
    union = area_a + jnp.transpose(area_b) - inter
    return inter > thresh * union


def _colmat(m, v):
    """[T, S] f32 @ [S, 1] f32 -> [T, 1] (sublane-crossing reduction)."""
    return jnp.dot(m, v, preferred_element_type=jnp.float32)


def _kernel(boxes_ref, valid_ref, keep_ref, surv_ref, scnt_ref, *,
            thresh, cap, cap_pad, tile):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _reset():
        scnt_ref[0] = 0
        surv_ref[:] = jnp.zeros_like(surv_ref)

    scount = scnt_ref[0]

    @pl.when(scount >= cap)
    def _full():
        keep_ref[:] = jnp.zeros_like(keep_ref)

    @pl.when(scount < cap)
    def _body():
        tb = boxes_ref[0]                                    # [T, 4]
        tk = valid_ref[0] != 0                               # [T, 1] bool

        # suppression by survivors from earlier tiles (compacted buffer)
        col = lax.broadcasted_iota(jnp.int32, (tile, cap_pad), 1)
        prev = _iou_exceeds(tb, surv_ref[:], thresh) & (col < scount)
        tk = tk & ~jnp.any(prev, axis=1, keepdims=True)

        # within-tile greedy fixpoint.  M[t, k] == (k < t and IoU > thr):
        # "k suppresses t"; column-form reductions are matmuls by M.
        ri = lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        ci = lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        earlier = (ci < ri).astype(jnp.float32)              # [T, T]
        m_sup = jnp.where(_iou_exceeds(tb, tb, thresh), earlier, 0.0)

        def cond(state):
            _, changed = state
            return changed

        def body(state):
            # alive rides the loop as f32 (1.0 = alive): Mosaic cannot
            # legalize scf.yield of i1 vector states (layout mismatch)
            af, _ = state                                    # [T, 1] f32
            alive = af > 0.0
            incoming = _colmat(m_sup, af) > 0.0
            dominators = (alive & ~incoming).astype(jnp.float32)
            victims = alive & (_colmat(m_sup, dominators) > 0.0)
            return jnp.where(victims, 0.0, af), jnp.any(victims)

        tkf, _ = lax.while_loop(cond, body,
                                (tk.astype(jnp.float32), jnp.bool_(True)))
        tk = tkf > 0.0

        # compact survivors into the buffer: exclusive cumsum = matmul by
        # the strict-lower mask; scatter = one-hot contraction on the MXU
        tkf = tk.astype(jnp.float32)                         # [T, 1]
        pos = scount + _colmat(earlier, tkf).astype(jnp.int32)  # [T, 1]
        rows = lax.broadcasted_iota(jnp.int32, (tile, cap_pad), 1)
        onehot_t = jnp.where((rows == pos) & tk, 1.0, 0.0)   # [T, cap_pad]
        # HIGHEST: the default MXU pass truncates f32 operands to bf16,
        # which would corrupt the survivor COORDINATES (each output is one
        # coordinate selected by a 1.0 — exact iff the multiply is f32)
        add = lax.dot_general(onehot_t, tb, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=lax.Precision.HIGHEST)
        written = lax.dot_general(onehot_t, tkf, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        surv_ref[:] = jnp.where(written > 0.0, add, surv_ref[:])

        keep_ref[0] = tk.astype(keep_ref.dtype)
        scnt_ref[0] = scount + jnp.sum(tkf).astype(jnp.int32)


@functools.partial(jax.jit,
                   static_argnames=("iou_threshold", "tile", "max_out",
                                    "interpret"))
def nms_keep_mask_batched(boxes: jnp.ndarray, valid: jnp.ndarray,
                          iou_threshold: float, tile: int = 256,
                          max_out: int | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Batched greedy keep-mask over score-sorted boxes, one pallas call.

    boxes: [B, N, 4] float32 (descending score); valid: [B, N] bool.
    Returns keep [B, N] bool.  Drop-in batched equivalent of vmapped
    ops.nms.nms_keep_mask (same fixpoint, same survivor-cap early exit —
    and the early exit is per image here, not per batch).
    """
    b, n, _ = boxes.shape
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        boxes = jnp.pad(boxes, ((0, 0), (0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, n_pad - n)))
    n_tiles = n_pad // tile

    cap = n if max_out is None else min(max_out, n)
    cap_pad = -(-cap // 128) * 128

    kern = functools.partial(_kernel, thresh=float(iou_threshold), cap=cap,
                             cap_pad=cap_pad, tile=tile)
    keep = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, 4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((cap_pad, 4), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(boxes.astype(jnp.float32),
      valid.astype(jnp.int32)[..., None])
    return keep[..., 0][:, :n] != 0
