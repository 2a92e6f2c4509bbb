"""Loss functions: smooth-L1, masked cross-entropy, margin ranking.

Pinned to the reference implementations:
  * `_smooth_l1_loss` with inside/outside weights, sigma, and the
    sum-over-dims-then-batch-mean reduction (lib/model/utils/net_utils.py:75-90);
  * the pairwise margin-ranking loss over |score_i - score_j| maps vs
    |label_i - label_j| maps with torch.nn.MarginRankingLoss semantics
    (faster_rcnn_sys_transformer_sk_dilat.py:300-309, margin cfg.TRAIN.MARGIN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def smooth_l1_loss(pred, target, inside_weights, outside_weights,
                   sigma: float = 1.0, reduce_dims=(1,)):
    """net_utils.py:75-90: weighted smooth-L1, sum over reduce_dims, mean rest."""
    sigma2 = sigma ** 2
    diff = inside_weights * (pred - target)
    abs_diff = jnp.abs(diff)
    sign = (abs_diff < 1.0 / sigma2).astype(pred.dtype)
    per = (diff ** 2) * (sigma2 / 2.0) * sign + \
          (abs_diff - 0.5 / sigma2) * (1.0 - sign)
    per = outside_weights * per
    per = jnp.sum(per, axis=reduce_dims)
    return jnp.mean(per)


def masked_cross_entropy(logits, labels, valid):
    """Mean CE over `valid` entries (RPN cls loss, rpn.py:105-114).

    One-hot formulation: the integer-label CE lowers to a take_along_axis
    gather, which profiles at >1 ms/step on TPU for the anchor set; with 2
    classes the one-hot multiply-sum is a trivial vector op instead.
    """
    onehot = jax.nn.one_hot(jnp.maximum(labels, 0), logits.shape[-1],
                            dtype=jnp.float32)
    ce = optax.softmax_cross_entropy(logits.astype(jnp.float32), onehot)
    valid = valid.astype(jnp.float32)
    return jnp.sum(ce * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def margin_ranking_loss(score_prob, labels, margin: float):
    """Pairwise ranking on |p_i - p_j| vs |l_i - l_j| maps.

    score_prob: [B, R] match probabilities; labels: [B, R] binary.
    torch.MarginRankingLoss: mean(max(0, -target*(x1 - x2) + margin)) with
    x1 = pr_map, x2 = gt_map, target = 2*gt_map - 1
    (faster_rcnn_sys:300-309: target = -((gt_map-1)^2) + gt_map).
    """
    lab = labels.astype(jnp.float32)
    gt_map = jnp.abs(lab[:, None, :] - lab[:, :, None])
    p = score_prob.astype(jnp.float32)
    pr_map = jnp.abs(p[:, None, :] - p[:, :, None])
    target = 2.0 * gt_map - 1.0
    return jnp.mean(jnp.maximum(0.0, -target * (pr_map - gt_map) + margin))
