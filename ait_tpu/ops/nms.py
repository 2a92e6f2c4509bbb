"""Exact greedy NMS as a fixed-shape, batched TPU program.

The reference runs NMS per image on the host side of a CUDA bitmask kernel
(lib/model/csrc/cuda/nms.cu:23-123: device pairwise-IoU tiles + a host greedy
sweep), inside a Python loop over the batch (proposal_layer.py:134-166) — the
single biggest serialization point of the whole pipeline (~0.33s/step).

Here the greedy sweep itself is vectorized and bounded by the OUTPUT size:
boxes are score-sorted and processed in tiles of T.  Each tile is first
suppressed by the survivors recorded so far (a compacted [cap, 4] buffer —
far smaller than the candidate set), then resolved internally by iterative
peeling: each round confirms all currently-undominated boxes and removes
their victims.  The fixpoint equals the sequential greedy solution exactly
(the suppression graph is a DAG in score order).  Because only the top
`max_out` survivors can ever be emitted, the sweep stops as soon as the
survivor buffer is full — on real score distributions that is a small
fraction of the candidate tiles.

IoU uses the same +1 area convention as nms.cu:16-19.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ait_tpu.ops.boxes import bbox_overlaps  # noqa: F401 (re-export)

NEG_INF = jnp.float32(-1e30)


def _iou_exceeds(a, b, thresh):
    """(IoU > thresh) via inter > thresh*union — division-free so the XLA
    and Mosaic (ops.nms_pallas) paths agree bitwise; +1 area convention
    (nms.cu:16-19).  a: [N, 4], b: [M, 4] -> [N, M] bool."""
    iw = (jnp.minimum(a[:, None, 2], b[None, :, 2]) -
          jnp.maximum(a[:, None, 0], b[None, :, 0]) + 1.0)
    ih = (jnp.minimum(a[:, None, 3], b[None, :, 3]) -
          jnp.maximum(a[:, None, 1], b[None, :, 1]) + 1.0)
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_a = (a[:, 2] - a[:, 0] + 1.0) * (a[:, 3] - a[:, 1] + 1.0)
    area_b = (b[:, 2] - b[:, 0] + 1.0) * (b[:, 3] - b[:, 1] + 1.0)
    union = area_a[:, None] + area_b[None, :] - inter
    return inter > thresh * union


def _pad_to(x, n, axis, value):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _round_up(x, m):
    return -(-x // m) * m


def _tile_self_suppress(adj: jnp.ndarray, alive: jnp.ndarray) -> jnp.ndarray:
    """Resolve greedy NMS inside one tile.

    adj[k, j] == True  <=>  k < j and IoU(k, j) > thresh (k would suppress j).
    Returns the surviving mask; exact greedy fixpoint.
    """

    def cond(state):
        _, changed = state
        return changed

    def body(state):
        alive, _ = state
        # a box is a dominator if nothing alive can still suppress it
        incoming = jnp.any(adj & alive[:, None], axis=0)
        dominators = alive & ~incoming
        victims = alive & jnp.any(adj & dominators[:, None], axis=0)
        return alive & ~victims, jnp.any(victims)

    alive, _ = lax.while_loop(cond, body, (alive, jnp.array(True)))
    return alive


def nms_keep_mask(boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold,
                  tile: int = 256, max_out: int | None = None) -> jnp.ndarray:
    """Greedy keep-mask over boxes already sorted by descending score.

    boxes: [N, 4]; valid: [N] bool (padding rows False).  Returns [N] bool.
    With `max_out`, the sweep stops once `max_out` survivors exist; keep bits
    for the first `max_out` survivors are exact (later bits may be
    under-reported — callers take the top `max_out` only).
    """
    n = boxes.shape[0]
    n_pad = _round_up(n, tile)
    n_tiles = n_pad // tile
    boxes_p = _pad_to(boxes, n_pad, 0, 0.0)
    keep = _pad_to(valid, n_pad, 0, False)

    cap = n if max_out is None else min(max_out, n)
    cap_pad = _round_up(cap, 128)
    surv = jnp.zeros((cap_pad, 4), boxes.dtype)
    col = jnp.arange(cap_pad)
    r = jnp.arange(tile)

    def cond(state):
        i, _, _, scount = state
        return (i < n_tiles) & (scount < cap)

    def body(state):
        i, keep, surv, scount = state
        start = i * tile
        tb = lax.dynamic_slice(boxes_p, (start, 0), (tile, 4))
        tk = lax.dynamic_slice(keep, (start,), (tile,))
        # suppression by survivors from earlier tiles (compacted buffer)
        prev = _iou_exceeds(tb, surv, iou_threshold) & \
            (col < scount)[None, :]
        tk = tk & ~jnp.any(prev, axis=1)
        # within-tile resolution
        adj = _iou_exceeds(tb, tb, iou_threshold) & \
            (r[:, None] < r[None, :])
        tk = _tile_self_suppress(adj, tk)
        # append this tile's survivors to the buffer (score order)
        pos = scount + jnp.cumsum(tk) - tk
        idx = jnp.where(tk & (pos < cap_pad), pos, cap_pad)
        surv = surv.at[idx].set(tb, mode="drop")
        keep = lax.dynamic_update_slice(keep, tk, (start,))
        return i + 1, keep, surv, scount + jnp.sum(tk)

    _, keep, _, _ = lax.while_loop(
        cond, body, (jnp.int32(0), keep, surv, jnp.int32(0)))
    return keep[:n]


def _select_top(keep, k):
    """Indices of the first k True positions (score order), + valid mask."""
    n = keep.shape[0]
    rank = jnp.where(keep, jnp.arange(n), n)
    # partial selection: top_k of negated rank == k smallest ranks
    _, sel = lax.top_k(-rank, min(k, n))
    count = jnp.minimum(jnp.sum(keep), k)
    return sel, count


@functools.partial(jax.jit, static_argnames=("max_out", "tile"))
def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold,
        max_out: int, tile: int = 256):
    """Greedy NMS on unsorted boxes.  Returns (indices [max_out], count).

    indices are positions into the input arrays, in descending-score order,
    padded with -1 past `count`.  Drop-in for the reference `_C.nms`
    (lib/model/roi_layers/nms.py:3-5) with static output shape.
    """
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    sboxes = boxes[order]
    keep = nms_keep_mask(sboxes, jnp.ones(n, bool), iou_threshold, tile,
                         max_out=max_out)
    sel, count = _select_top(keep, max_out)
    pad = max_out - sel.shape[0]
    if pad > 0:
        sel = jnp.pad(sel, (0, pad))
    idx = jnp.where(jnp.arange(max_out) < count, order[sel], -1)
    return idx, count


def batched_nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray,
                     iou_threshold, pre_topk: int, post_topk: int,
                     tile: int = 256, valid=None, use_pallas: bool = True):
    """The proposal-layer NMS: per-image top-k -> greedy NMS -> top-k of kept.

    boxes: [B, N, 4], scores: [B, N]; valid: optional [B, N] bool marking real
    candidates (False rows can never be kept — used for anchors on the padded
    part of a static canvas, which don't exist in the reference at all).
    Returns (boxes [B, post, 4], scores [B, post], valid [B, post]); padded
    rows are zero boxes with zero score — exactly the reference's zero-padded
    output convention (proposal_layer.py:131,161-164).

    On TPU the greedy sweep runs as one Mosaic kernel
    (ops/nms_pallas.nms_keep_mask_batched — same fixpoint, survivor buffer
    in VMEM, no per-tile dispatch); elsewhere the XLA while-loop version.
    """
    n = boxes.shape[1]
    k = min(pre_topk, n)
    # align the candidate count to the sweep tile: rows past `k` are taken
    # by top_k but marked invalid, so results are bitwise identical to an
    # exact-k truncation while the sweep sees no partial tile.  (Also works
    # around a libtpu fault observed ONLY at unaligned k=6000 inside the
    # full eval program — pre=12000 and small canvases were fine, and every
    # op reproduced clean standalone.)
    k_eff = min(n, -(-k // tile) * tile)
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    scores = jnp.where(valid, scores, NEG_INF)

    top_sc, order = lax.top_k(scores, k_eff)             # [B, k_eff]
    sb = jnp.take_along_axis(boxes, order[..., None], axis=1)
    # validity rides the score (invalid rows were set to NEG_INF above):
    # saves a [B, N] bool gather, ~1 ms/step at train shapes
    sva = top_sc > NEG_INF / 2
    if k_eff > k:
        sva = sva & (jnp.arange(k_eff) < k)[None, :]

    def keep_xla(sb, sva):
        return jax.vmap(lambda b_, v_: nms_keep_mask(
            b_, v_, iou_threshold, tile, max_out=post_topk))(sb, sva)

    if use_pallas:
        from ait_tpu.ops.nms_pallas import nms_keep_mask_batched

        keep = jax.lax.platform_dependent(
            sb, sva,
            tpu=lambda b_, v_: nms_keep_mask_batched(
                b_, v_, iou_threshold, tile=tile, max_out=post_topk),
            default=keep_xla)
    else:
        keep = keep_xla(sb, sva)

    def one(sb, top_sc, keep):
        sel, count = _select_top(keep, post_topk)
        p = sel.shape[0]
        out_valid = jnp.arange(post_topk) < count
        out_b = jnp.zeros((post_topk, 4), boxes.dtype).at[:p].set(sb[sel])
        out_s = jnp.zeros((post_topk,), scores.dtype).at[:p].set(top_sc[sel])
        out_b = jnp.where(out_valid[:, None], out_b, 0.0)
        out_s = jnp.where(out_valid, out_s, 0.0)
        return out_b, out_s, out_valid

    return jax.vmap(one)(sb, top_sc, keep)
