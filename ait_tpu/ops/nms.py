"""Exact greedy NMS as a fixed-shape, batched TPU program.

The reference runs NMS per image on the host side of a CUDA bitmask kernel
(lib/model/csrc/cuda/nms.cu:23-123: device pairwise-IoU tiles + a host greedy
sweep), inside a Python loop over the batch (proposal_layer.py:134-166) — the
single biggest serialization point of the whole pipeline (~0.33s/step).

Here the greedy sweep itself is vectorized: boxes are score-sorted, processed
in tiles of T.  Each tile is first suppressed by every kept box in earlier
tiles (one [T, N] masked IoU), then resolved internally by iterative peeling —
each round confirms all currently-undominated boxes and removes their victims.
The fixpoint equals the sequential greedy solution exactly (the suppression
graph is a DAG in score order), and the loop runs O(longest suppression chain)
rounds, not O(T).

IoU uses the same +1 area convention as nms.cu:16-19.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ait_tpu.ops.boxes import bbox_overlaps

NEG_INF = jnp.float32(-1e30)


def _pad_to(x, n, axis, value):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


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


def nms_keep_mask(boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float,
                  tile: int = 256) -> jnp.ndarray:
    """Greedy keep-mask over boxes already sorted by descending score.

    boxes: [N, 4]; valid: [N] bool (padding rows False).  Returns [N] bool.
    """
    n = boxes.shape[0]
    n_pad = -(-n // tile) * tile
    boxes_p = _pad_to(boxes, n_pad, 0, 0.0)
    keep = _pad_to(valid, n_pad, 0, False)
    col = jnp.arange(n_pad)

    def outer(i, keep):
        start = i * tile
        tile_boxes = lax.dynamic_slice(boxes_p, (start, 0), (tile, 4))
        tile_keep = lax.dynamic_slice(keep, (start,), (tile,))
        iou = bbox_overlaps(tile_boxes, boxes_p)  # [T, n_pad]
        over = iou > iou_threshold
        # suppression by surviving boxes in strictly earlier tiles
        prev = keep & (col < start)
        tile_keep = tile_keep & ~jnp.any(over & prev[None, :], axis=1)
        # within-tile resolution
        iou_tt = lax.dynamic_slice(over, (0, start), (tile, tile))
        r = jnp.arange(tile)
        adj = iou_tt & (r[:, None] < r[None, :])
        tile_keep = _tile_self_suppress(adj, tile_keep)
        return lax.dynamic_update_slice(keep, tile_keep, (start,))

    keep = lax.fori_loop(0, n_pad // tile, outer, keep)
    return keep[:n]


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
    keep = nms_keep_mask(sboxes, jnp.ones(n, bool), iou_threshold, tile)
    # compact kept indices to the front, preserving score order
    rank = jnp.where(keep, jnp.arange(n), n)
    sel = jnp.argsort(rank)[:max_out]
    count = jnp.minimum(jnp.sum(keep), max_out)
    idx = jnp.where(jnp.arange(max_out) < count, order[sel], -1)
    return idx, count


def batched_nms_topk(boxes: jnp.ndarray, scores: jnp.ndarray,
                     iou_threshold, pre_topk: int, post_topk: int,
                     tile: int = 256, valid=None):
    """The proposal-layer NMS: per-image top-k -> greedy NMS -> top-k of kept.

    boxes: [B, N, 4], scores: [B, N]; valid: optional [B, N] bool marking real
    candidates (False rows can never be kept — used for anchors on the padded
    part of a static canvas, which don't exist in the reference at all).
    Returns (boxes [B, post, 4], scores [B, post], valid [B, post]); padded
    rows are zero boxes with zero score — exactly the reference's zero-padded
    output convention (proposal_layer.py:131,161-164).
    """
    n = boxes.shape[1]
    k = min(pre_topk, n)
    if valid is None:
        valid = jnp.ones(scores.shape, bool)
    scores = jnp.where(valid, scores, NEG_INF)

    def one(bx, sc, va):
        top_sc, order = lax.top_k(sc, k)
        sb = bx[order]
        keep = nms_keep_mask(sb, va[order], iou_threshold, tile)
        rank = jnp.where(keep, jnp.arange(k), k)
        p = min(post_topk, k)
        sel = jnp.argsort(rank)[:p]
        out_valid = jnp.arange(post_topk) < jnp.minimum(jnp.sum(keep),
                                                       post_topk)
        out_b = jnp.zeros((post_topk, 4), boxes.dtype).at[:p].set(sb[sel])
        out_s = jnp.zeros((post_topk,), scores.dtype).at[:p].set(top_sc[sel])
        out_b = jnp.where(out_valid[:, None], out_b, 0.0)
        out_s = jnp.where(out_valid, out_s, 0.0)
        return out_b, out_s, out_valid

    return jax.vmap(one)(boxes, scores, valid)
