"""Training target assignment as fixed-shape, rng-keyed, batched ops.

Replaces the reference's host-side numpy subsampling loops
(lib/model/rpn/anchor_target_layer.py:50-199 — profiled at 0.588s/step — and
proposal_target_layer_cascade.py:123-220) with jit-compatible programs:
  * per-image random permutations become key-sorted index compactions;
  * "sample k of n without replacement" = rank-by-uniform, keep rank < k;
  * "sample with replacement" = floor(uniform * n) (the reference's own
    np.floor(np.random.rand(k) * n) idiom, proposal_target:175-176);
  * _unmap disappears: labels are computed over the full anchor set with
    outside-image anchors forced to ignore (-1).

Distributions match the reference (same selection rules and counts); the
sequences differ (jax.random vs numpy MT19937), which only matters for
bit-exact replay, not for training statistics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ait_tpu.ops.boxes import bbox_overlaps_masked, bbox_transform


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray           # [B, N] int32 in {-1, 0, 1}
    bbox_targets: jnp.ndarray     # [B, N, 4]
    inside_weights: jnp.ndarray   # [B, N, 4]
    outside_weights: jnp.ndarray  # [B, N, 4]


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray             # [B, R, 5] (batch idx in col 0)
    labels: jnp.ndarray           # [B, R] int32 (binary match label)
    bbox_targets: jnp.ndarray     # [B, R, 4] (normalized)
    inside_weights: jnp.ndarray   # [B, R, 4]
    outside_weights: jnp.ndarray  # [B, R, 4]


def _keep_k_random(mask, k, key, k_max: int):
    """Randomly keep at most k True entries of `mask` (without replacement).

    `k` may be traced; `k_max` is its static upper bound.  Partial selection
    (top_k of random keys) instead of a full argsort — k_max is small
    (<=256) while the anchor set is ~17k, and full sorts are the expensive
    primitive on TPU.
    """
    n = mask.shape[0]
    r = jax.random.uniform(key, (n,), minval=0.0, maxval=1.0)
    masked = jnp.where(mask, r, 2.0)
    smallest = -jax.lax.top_k(-masked, min(k_max, n))[0]  # ascending keys
    kth = smallest[jnp.clip(k - 1, 0, smallest.shape[0] - 1)]
    kth = jnp.where(k > 0, kth, -1.0)
    return mask & (masked <= kth)


def _random_compaction(mask, key):
    """Indices of True entries first, in random order ([n] int32)."""
    r = jax.random.uniform(key, mask.shape)
    return jnp.argsort(jnp.where(mask, r, 2.0))


def anchor_targets(anchors: jnp.ndarray, gt_boxes: jnp.ndarray,
                   im_info: jnp.ndarray, key, *,
                   batch_size: int = 256, fg_fraction: float = 0.5,
                   positive_overlap: float = 0.7,
                   negative_overlap: float = 0.3,
                   clobber_positives: bool = False) -> AnchorTargets:
    """RPN training labels for every anchor (anchor_target_layer.py:50-199).

    anchors: [N, 4]; gt_boxes: [B, G, 5] zero-padded; im_info: [B, 3].
    Label rules: inside-image anchors only; bg if max IoU < negative_overlap;
    fg if the anchor ties the per-gt max IoU or max IoU >= positive_overlap;
    then random subsample to `batch_size` at `fg_fraction`.
    """
    b = gt_boxes.shape[0]
    keys = jax.random.split(key, b)
    num_fg = int(fg_fraction * batch_size)

    def one(gt, info, k):
        k1, k2 = jax.random.split(k)
        inside = ((anchors[:, 0] >= 0) & (anchors[:, 1] >= 0) &
                  (anchors[:, 2] < info[1]) & (anchors[:, 3] < info[0]))
        overlaps = bbox_overlaps_masked(anchors, gt[:, :4])   # [N, G]
        overlaps = jnp.where(inside[:, None], overlaps, -1.0)
        max_ov = jnp.max(overlaps, axis=1)
        argmax_gt = jnp.argmax(overlaps, axis=1)

        labels = jnp.full(anchors.shape[0], -1, jnp.int32)
        if not clobber_positives:
            labels = jnp.where(inside & (max_ov < negative_overlap), 0, labels)
        # per-gt argmax rule (ties included, anchor_target_layer.py:110-114)
        gt_max = jnp.max(overlaps, axis=0)
        gt_max = jnp.where(gt_max == 0, 1e-5, gt_max)
        is_gt_argmax = jnp.any(overlaps == gt_max[None, :], axis=1)
        labels = jnp.where(inside & is_gt_argmax, 1, labels)
        labels = jnp.where(inside & (max_ov >= positive_overlap), 1, labels)
        if clobber_positives:
            labels = jnp.where(inside & (max_ov < negative_overlap), 0, labels)

        keep_fg = _keep_k_random(labels == 1, num_fg, k1, num_fg)
        labels = jnp.where((labels == 1) & ~keep_fg, -1, labels)
        num_bg = batch_size - jnp.sum(labels == 1)
        keep_bg = _keep_k_random(labels == 0, num_bg, k2, batch_size)
        labels = jnp.where((labels == 0) & ~keep_bg, -1, labels)

        # one-hot contraction instead of a row gather (gathers profile at
        # ~1 ms/step on TPU for the anchor set; G is tiny).  HIGHEST
        # precision: the MXU's default bf16 truncation shifts coords >=1024
        # by up to ~4 px (ulp=8), silently skewing regression targets.
        onehot = jax.nn.one_hot(argmax_gt, gt.shape[0], dtype=jnp.float32)
        matched = jax.lax.dot(onehot, gt[:, :4],
                              precision=jax.lax.Precision.HIGHEST)
        targets = bbox_transform(anchors, matched)
        inside_w = jnp.where(labels == 1, 1.0, 0.0)[:, None] * jnp.ones(4)
        num_examples = jnp.maximum(jnp.sum(labels >= 0), 1)
        outside_w = jnp.where(labels >= 0, 1.0 / num_examples,
                              0.0)[:, None] * jnp.ones(4)
        return labels, targets, inside_w, outside_w

    out = jax.vmap(one)(gt_boxes, im_info, keys)
    return AnchorTargets(*out)


def proposal_targets(rois: jnp.ndarray, gt_boxes: jnp.ndarray, key, *,
                     rois_per_image: int = 128, fg_fraction: float = 0.25,
                     fg_thresh: float = 0.5, bg_thresh_hi: float = 0.5,
                     bg_thresh_lo: float = 0.1,
                     bbox_normalize_means=(0.0, 0.0, 0.0, 0.0),
                     bbox_normalize_stds=(0.1, 0.1, 0.2, 0.2),
                     bbox_inside_weights=(1.0, 1.0, 1.0, 1.0)
                     ) -> ProposalTargets:
    """Sample training ROIs (proposal_target_layer_cascade.py:123-220).

    rois: [B, P, 5]; gt_boxes: [B, G, 5] zero-padded.  Appends gt boxes to
    the candidate set, samples `rois_per_image` at `fg_fraction` (fg without
    replacement, bg with replacement — the reference's exact scheme including
    the fg-only / bg-only edge cases :158-197).
    """
    b = rois.shape[0]
    fg_per_image = max(int(round(fg_fraction * rois_per_image)), 1)
    keys = jax.random.split(key, b)
    means = jnp.asarray(bbox_normalize_means)
    stds = jnp.asarray(bbox_normalize_stds)
    in_w = jnp.asarray(bbox_inside_weights)

    def one(img_idx, roi, gt, k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        gt_append = jnp.concatenate(
            [jnp.zeros((gt.shape[0], 1), gt.dtype), gt[:, :4]], axis=1)
        all_rois = jnp.concatenate([roi, gt_append], axis=0)     # [Np, 5]
        n_p = all_rois.shape[0]

        overlaps = bbox_overlaps_masked(all_rois[:, 1:5], gt[:, :4])
        max_ov = jnp.max(overlaps, axis=1)
        gt_assignment = jnp.argmax(overlaps, axis=1)
        labels_raw = gt[gt_assignment, 4].astype(jnp.int32)

        fg_mask = max_ov >= fg_thresh
        bg_mask = (max_ov < bg_thresh_hi) & (max_ov >= bg_thresh_lo)
        fg_num = jnp.sum(fg_mask)
        bg_num = jnp.sum(bg_mask)
        has_fg = fg_num > 0
        has_bg = bg_num > 0

        compact_fg = _random_compaction(fg_mask, k1)
        compact_bg = _random_compaction(bg_mask, k2)
        # with-replacement draws, the reference's floor(rand * n) idiom
        u_fg = jax.random.uniform(k3, (rois_per_image,))
        u_bg = jax.random.uniform(k4, (rois_per_image,))
        fg_draw = jnp.floor(u_fg * jnp.maximum(fg_num, 1)).astype(jnp.int32)
        bg_draw = jnp.floor(u_bg * jnp.maximum(bg_num, 1)).astype(jnp.int32)

        fg_this = jnp.where(
            has_fg & has_bg, jnp.minimum(fg_per_image, fg_num),
            jnp.where(has_fg, rois_per_image, 0))

        i = jnp.arange(rois_per_image)
        # fg picks: without replacement when bg exists, else with replacement
        fg_pick = jnp.where(has_bg,
                            compact_fg[jnp.minimum(i, n_p - 1)],
                            compact_fg[fg_draw])
        bg_pick = compact_bg[bg_draw]
        picks = jnp.where(i < fg_this, fg_pick, bg_pick)

        labels = jnp.where(i < fg_this, labels_raw[picks], 0)
        rois_out = all_rois[picks]
        rois_out = rois_out.at[:, 0].set(img_idx.astype(rois_out.dtype))

        gt_sel = gt[gt_assignment[picks], :4]
        targets = (bbox_transform(rois_out[:, 1:5], gt_sel) - means) / stds
        inside_w = jnp.where(labels[:, None] > 0, in_w, 0.0)
        outside_w = (inside_w > 0).astype(targets.dtype)
        return rois_out, labels, targets, inside_w, outside_w

    out = jax.vmap(one)(jnp.arange(b), rois, gt_boxes, keys)
    return ProposalTargets(*out)
