"""The full one-shot detector: Siamese backbone -> co-attention -> RPN ->
ROI Align -> AIT transformer -> SK attention -> match/box heads.

A fixed-shape re-design of the reference `_fasterRCNN.forward`
(lib/model/faster_rcnn/faster_rcnn_sys_transformer_sk_dilat.py:173-328 /
faster_rcnn_coatt_transformer_sk.py:219-375 — the two differ only in the
co-attention flavor).  One flax module; everything under a single jit; the
train path threads explicit rng streams ('dropout', 'sampling') instead of
global numpy state.

Inputs (NHWC, static shapes):
  image    [B, H, W, 3]     padded canvas, true extent in im_info
  query    [B, 128, 128, 3]
  im_info  [B, 3]           (h, w, scale)
  gt_boxes [B, G, 5]        zero-padded, binary relabeled class in col 4
  num_boxes [B]             (unused on-device; padding is self-describing)

Returns a DetectorOut: rois [B, R, 5], cls_prob [B, R, 1], bbox_pred
[B, R, 4], per-component losses (zeros at eval), rois_label — the reference's
10-tuple minus the always-None c_att.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ait_tpu.config import Config
from ait_tpu.models import losses as L
from ait_tpu.models.ait_transformer import AITTransformer
from ait_tpu.models.coattention import MHACoAttention, NonLocalCoAttention
from ait_tpu.models.resnet import (ContextualRelation, ResNetBackbone,
                                   ResNetTop)
from ait_tpu.models.rpn import RPNHead, proposal_layer
from ait_tpu.models.sknet import SKNet
from ait_tpu.models.targets import anchor_targets, proposal_targets
from ait_tpu.models.vgg import VGGBackbone, VGGTop
from ait_tpu.ops.anchors import shifted_anchors
from ait_tpu.ops.roi_align import roi_align
from ait_tpu.ops.roi_pool import roi_pool

Dtype = Any

# torchvision normalization constants (blob.py:42-48); applied on device
# when inputs arrive as uint8 (cfg.tpu.input_uint8 — 4x less H2D traffic)
_NORM_MEAN = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
_NORM_STD = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)


def _to_model_input(x, dtype):
    if x.dtype == jnp.uint8:
        # host space-to-depth inputs carry 4 pixel groups of 3 channels;
        # normalization is elementwise so it commutes with the regroup
        reps = x.shape[-1] // 3
        mean = jnp.tile(_NORM_MEAN, reps) if reps > 1 else _NORM_MEAN
        std = jnp.tile(_NORM_STD, reps) if reps > 1 else _NORM_STD
        x = (x.astype(jnp.float32) / 255.0 - mean) / std
    return x.astype(dtype)


class DetectorOut(NamedTuple):
    rois: jnp.ndarray
    cls_prob: jnp.ndarray
    bbox_pred: jnp.ndarray
    rpn_loss_cls: jnp.ndarray
    rpn_loss_box: jnp.ndarray
    rcnn_loss_cls: jnp.ndarray
    margin_loss: jnp.ndarray
    rcnn_loss_bbox: jnp.ndarray
    rois_label: Optional[jnp.ndarray]

    @property
    def total_loss(self):
        return (self.rpn_loss_cls + self.rpn_loss_box + self.rcnn_loss_cls +
                self.margin_loss + self.rcnn_loss_bbox)


class AITDetector(nn.Module):
    cfg: Config
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        mc = c.model
        ch = mc.channels
        if mc.backbone.startswith("resnet"):
            self.backbone = ResNetBackbone(mc.backbone, dtype=self.dtype)
            self.top = ResNetTop(mc.backbone, dtype=self.dtype)
        elif mc.backbone == "vgg16":
            self.backbone = VGGBackbone(dtype=self.dtype)
            self.top = VGGTop(dtype=self.dtype)
        else:
            raise ValueError(mc.backbone)

        # sequence parallelism (cfg.tpu.sp_size > 1): the co-attention's
        # image-token sequence — the detector's only beyond-chip activation
        # at large canvases — shards over the 'seq' mesh axis (parallel/sp.py;
        # inference path, requires running inside shard_map on a mesh with
        # that axis)
        sp_axis = c.tpu.sp_axis if c.tpu.sp_size > 1 else None
        if mc.coattention == "mha":
            self.coattention = MHACoAttention(
                ch, mc.t_n_head, mc.t_d_k, mc.t_d_v, mc.t_dropout,
                dtype=self.dtype, tp_size=c.tpu.tp_size,
                tp_axis=c.tpu.tp_axis, sp_axis=sp_axis)
        elif mc.coattention == "nonlocal":
            self.coattention = NonLocalCoAttention(
                ch, mc.coatt_normalization, dtype=self.dtype,
                sp_axis=sp_axis)
        else:
            raise ValueError(mc.coattention)

        self.rpn = RPNHead(
            num_anchors=len(c.ANCHOR_SCALES) * len(c.ANCHOR_RATIOS),
            dtype=self.dtype)
        self.transformer = AITTransformer(
            d_word_vec=mc.t_d_model, d_model=mc.t_d_model,
            d_inner=mc.t_d_inner, n_layers=mc.t_n_layers,
            n_head=mc.t_n_head, d_k=mc.t_d_k, d_v=mc.t_d_v,
            n_position=mc.t_n_position, dropout=mc.t_dropout,
            causal_mask=mc.t_causal_mask, dist=mc.t_attn_dist,
            channels=ch, dtype=self.dtype,
            use_pallas=c.tpu.use_pallas_attention,
            tp_size=c.tpu.tp_size, tp_axis=c.tpu.tp_axis,
            dec_prefix_per_image=c.tpu.dec_prefix_per_image)
        self.sk = SKNet(ch, gate=mc.sk_gate, dtype=self.dtype)

        if mc.with_contextual_relation:
            if not mc.backbone.startswith("resnet"):
                raise ValueError("contextual relation needs stage taps — "
                                 "resnet backbones only (as the reference)")
            self.contextual = ContextualRelation(
                channels=2048, reduction=mc.rnn_reduction,
                rnn_layers=mc.rnn_layers,
                bidirectional=mc.rnn_bidirectional,
                method=mc.rnn_method, dtype=self.dtype)

        # heads (resnet_sys_transformer_sk_dilat.py:425-433; init
        # faster_rcnn_sys:342-347)
        self.cls_score_0 = nn.Dense(
            8, kernel_init=nn.initializers.normal(0.01), dtype=self.dtype)
        self.cls_score_1 = nn.Dense(
            2, kernel_init=nn.initializers.normal(0.01), dtype=self.dtype)
        n_box = 4 if mc.class_agnostic else 4 * 2
        self.bbox_pred_head = nn.Dense(
            n_box, kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype)

    def __call__(self, image, query, im_info, gt_boxes, num_boxes,
                 *, train: bool = False, pair_image_idx=None):
        """pair_image_idx (eval-only): [P] int map from pair row -> image
        row, letting `image` hold only the UNIQUE images of the pair batch.
        The query-independent image backbone — the heaviest per-pair eval
        stage — then runs once per image instead of once per pair; the
        reference's `--a N` shot-averaging protocol (test_net_voc.py:320)
        re-runs it N times, and its bs=1 loop cannot amortize it."""
        c = self.cfg
        det = not train
        b = query.shape[0]

        image_feat = self.backbone(_to_model_input(image, self.dtype))
        if pair_image_idx is not None:
            if train:
                raise ValueError("pair_image_idx is an eval-path feature")
            image_feat = image_feat[pair_image_idx]
        else:
            assert image.shape[0] == b, (image.shape, query.shape)
        query_scale = None
        if c.model.with_contextual_relation:
            query_feat, q_stages = self.backbone(
                _to_model_input(query, self.dtype), return_stages=True)
            query_scale = self.contextual(q_stages)       # [B, 2048] f32
        else:
            query_feat = self.backbone(_to_model_input(query, self.dtype))
        non_img, non_qry = self.coattention(image_feat, query_feat,
                                            deterministic=det)

        rpn_out = self.rpn(non_img)
        fh, fw = non_img.shape[1], non_img.shape[2]
        anchors = shifted_anchors(fh, fw, c.FEAT_STRIDE[0],
                                  ratios=c.ANCHOR_RATIOS,
                                  scales=c.ANCHOR_SCALES)
        tc = c.TRAIN if train else c.TEST
        rois = proposal_layer(
            rpn_out, anchors, im_info,
            pre_nms_topk=tc.RPN_PRE_NMS_TOP_N,
            post_nms_topk=tc.RPN_POST_NMS_TOP_N,
            nms_thresh=tc.RPN_NMS_THRESH,
            use_pallas_nms=c.tpu.use_pallas_nms)
        # (gradients already stopped at the proposal layer's inputs — see
        # rpn.proposal_layer)

        zero = jnp.zeros((), jnp.float32)
        rpn_loss_cls = rpn_loss_box = zero
        rcnn_loss_cls = margin_loss = rcnn_loss_bbox = zero
        rois_label = None

        if train:
            at = anchor_targets(
                anchors, gt_boxes, im_info, self.make_rng("sampling"),
                batch_size=c.TRAIN.RPN_BATCHSIZE,
                fg_fraction=c.TRAIN.RPN_FG_FRACTION,
                positive_overlap=c.TRAIN.RPN_POSITIVE_OVERLAP,
                negative_overlap=c.TRAIN.RPN_NEGATIVE_OVERLAP,
                clobber_positives=c.TRAIN.RPN_CLOBBER_POSITIVES)
            a = self.rpn.num_anchors
            cls_logits = rpn_out.cls_logits.transpose(0, 1, 2, 4, 3)
            cls_logits = cls_logits.reshape(b, -1, 2)      # (y, x, a) order
            rpn_loss_cls = L.masked_cross_entropy(
                cls_logits, at.labels, at.labels != -1)
            deltas = rpn_out.bbox_deltas.astype(jnp.float32)
            deltas = deltas.reshape(b, fh * fw * a, 4)
            rpn_loss_box = L.smooth_l1_loss(
                deltas, at.bbox_targets, at.inside_weights,
                at.outside_weights, sigma=3.0, reduce_dims=(1, 2))

            pt = proposal_targets(
                rois, gt_boxes, self.make_rng("sampling"),
                rois_per_image=c.TRAIN.BATCH_SIZE,
                fg_fraction=c.TRAIN.FG_FRACTION,
                fg_thresh=c.TRAIN.FG_THRESH,
                bg_thresh_hi=c.TRAIN.BG_THRESH_HI,
                bg_thresh_lo=c.TRAIN.BG_THRESH_LO,
                bbox_normalize_means=c.TRAIN.BBOX_NORMALIZE_MEANS,
                bbox_normalize_stds=c.TRAIN.BBOX_NORMALIZE_STDS,
                bbox_inside_weights=c.TRAIN.BBOX_INSIDE_WEIGHTS)
            rois = pt.rois
            rois_label = pt.labels

        num_props = rois.shape[1]
        if c.POOLING_MODE == "align":
            props = roi_align(non_img, rois[..., 1:5],
                              out_size=c.POOLING_SIZE,
                              spatial_scale=1.0 / c.FEAT_STRIDE[0],
                              sampling_ratio=c.tpu.roi_sampling_ratio)
        elif c.POOLING_MODE == "pool":
            props = roi_pool(non_img, rois[..., 1:5],
                             out_size=c.POOLING_SIZE,
                             spatial_scale=1.0 / c.FEAT_STRIDE[0])
        else:
            raise ValueError(c.POOLING_MODE)
        props = props.reshape((b * num_props,) + props.shape[2:])

        props = self.transformer(props, non_qry, deterministic=det)
        props, qfeat = self.sk(props, non_qry)

        props_vec = self.top(props, deterministic=det)     # [B*R, D]
        query_vec = self.top(qfeat, deterministic=det)     # [B, D]

        if query_scale is not None:
            # "Recurrent Excitation": both streams scaled by the QUERY's
            # contextual gate (faster_rcnn_sys…:256-265), before bbox_pred
            s = query_scale.astype(props_vec.dtype)
            props_vec = (props_vec.reshape(b, num_props, -1)
                         * s[:, None, :]).reshape(props_vec.shape)
            query_vec = query_vec * s

        bbox_pred = self.bbox_pred_head(props_vec).astype(jnp.float32)

        d = props_vec.shape[-1]
        props_mat = props_vec.reshape(b, num_props, d)
        query_mat = jnp.broadcast_to(query_vec[:, None, :],
                                     (b, num_props, d))
        stack = jnp.concatenate([props_mat, query_mat], axis=-1)
        score = self.cls_score_1(self.cls_score_0(stack))  # [B, R, 2]
        score = score.astype(jnp.float32)
        score_prob = nn.softmax(score, axis=-1)[..., 1]    # [B, R]

        if train:
            flat_score = score.reshape(-1, 2)
            flat_label = rois_label.reshape(-1)
            rcnn_loss_cls = L.masked_cross_entropy(
                flat_score, flat_label,
                jnp.ones_like(flat_label, bool))
            margin_loss = 3.0 * L.margin_ranking_loss(
                score_prob, rois_label, c.TRAIN.MARGIN)
            rcnn_loss_bbox = L.smooth_l1_loss(
                bbox_pred, pt.bbox_targets.reshape(-1, 4),
                pt.inside_weights.reshape(-1, 4),
                pt.outside_weights.reshape(-1, 4), sigma=1.0,
                reduce_dims=(1,))

        cls_prob = score_prob.reshape(b, num_props, 1)
        bbox_pred = bbox_pred.reshape(b, num_props, -1)
        return DetectorOut(rois, cls_prob, bbox_pred, rpn_loss_cls,
                           rpn_loss_box, rcnn_loss_cls, margin_loss,
                           rcnn_loss_bbox, rois_label)
