"""End-to-end eval-forward parity of the FULL detector vs the torch reference.

The strongest AP-parity evidence available without datasets or released
checkpoints: random-init reference weights are converted with
`convert.convert_detector`, then the WHOLE eval pipeline — Siamese backbone,
MHA co-attention, RPN heads, proposal layer (decode/clip/top-k/greedy NMS),
adaptive ROI Align (ratio=0), AIT transformer, SKNet, contextual heads —
runs on both frameworks from one identical input pair, and the final
(rois, cls_prob, bbox_pred) triples are compared.  The module-level parity
tests (test_torch_parity.py) pin each block; this pins their COMPOSITION,
including every layout/ordering seam between blocks.

The reference's compiled kernels are shimmed with exact CPU ports so its
model code runs on torch CPU (test scaffolding only, nothing ships):
  - `_C.nms`       -> greedy sweep, +1 IoU convention (nms.cu:16-19,
                      nms_cpu.cpp:6-74)
  - `_C.roi_align_forward` -> the numpy port of ROIAlign_cuda.cu:64-122
                      already golden-tested in test_ops_roi_align.py

Reference forward: faster_rcnn_sys_transformer_sk_dilat.py:173-375;
proposal layer host loop: proposal_layer.py:95-166.
"""

import sys

import numpy as np
import pytest
import torch

import ref_harness

ref_harness.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_ops_roi_align import np_roi_align  # noqa: E402

pytestmark = pytest.mark.slow  # torch reference forward + full-model compile


# ---------------------------------------------------------------------------
# CPU shims for the reference's compiled ops
# ---------------------------------------------------------------------------

def _greedy_nms(dets, scores, thresh):
    """Exact greedy NMS, +1 area convention (nms.cu:16-19).

    Returns keep indices in descending-score order, like _C.nms.
    """
    boxes = dets.detach().cpu().numpy().astype(np.float64)
    sc = scores.detach().cpu().numpy().astype(np.float64)
    order = np.argsort(-sc, kind="stable")
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    suppressed = np.zeros(len(boxes), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        iw = np.minimum(x2[i], x2) - np.maximum(x1[i], x1) + 1.0
        ih = np.minimum(y2[i], y2) - np.maximum(y1[i], y1) + 1.0
        inter = np.maximum(iw, 0.0) * np.maximum(ih, 0.0)
        # division-free like ops/nms.py so boundary decisions match
        suppressed |= inter > float(thresh) * (areas[i] + areas - inter)
    return torch.as_tensor(np.asarray(keep, np.int64))


def _roi_align_forward(feat, rois, spatial_scale, ph, pw, sampling_ratio):
    """NCHW torch wrapper over the golden numpy port (adaptive ratio=0)."""
    assert ph == pw
    f = feat.detach().cpu().numpy().transpose(0, 2, 3, 1)  # [B, H, W, C]
    r = rois.detach().cpu().numpy()
    out = np.zeros((len(r), ph, pw, f.shape[-1]), np.float64)
    for b in range(f.shape[0]):
        sel = np.where(r[:, 0] == b)[0]
        if len(sel):
            out[sel] = np_roi_align(f[b].astype(np.float64), r[sel, 1:],
                                    ph, spatial_scale, sampling_ratio)
    return torch.as_tensor(
        out.transpose(0, 3, 1, 2).astype(np.float32))


def _install_shims():
    import model.rpn.proposal_layer as ref_pl

    # proposal_layer binds `nms` at import time -> rebind its module global;
    # roi_align looks `_C.roi_align_forward` up at call time -> patch the
    # stub module ref_harness installed.
    ref_pl.nms = _greedy_nms
    sys.modules["model._C"].roi_align_forward = _roi_align_forward


# ---------------------------------------------------------------------------
# Proposal layer: decode/clip/top-k/NMS/pad vs the reference host loop
# ---------------------------------------------------------------------------

def test_proposal_layer_parity():
    _install_shims()
    from model.rpn.proposal_layer import _ProposalLayer
    from model.utils.config import cfg as ref_cfg

    from ait_tpu.models.rpn import RPNOut, proposal_layer
    from ait_tpu.ops.anchors import shifted_anchors

    h, w, a, b = 38, 50, 9, 1
    n = h * w * a
    rng = np.random.RandomState(7)
    # well-separated fg probabilities (min gap 1/N) so cross-framework float
    # noise can never flip the score ordering the greedy NMS depends on
    p = ((rng.permutation(n) + 0.5) / n).astype(np.float32)
    p = p.reshape(h, w, a)
    deltas = (rng.rand(h, w, a, 4).astype(np.float32) - 0.5) * 0.4
    im_info = np.array([[600.0, 800.0, 1.0]], np.float32)

    # reference side: probs [B, 2A, H, W] (first A bg, next A fg,
    # proposal_layer.py:69), deltas [B, 4A, H, W] a-major channels
    cls_t = torch.from_numpy(
        np.concatenate([1.0 - p, p], axis=-1).transpose(2, 0, 1)[None])
    dlt_t = torch.from_numpy(
        deltas.reshape(h, w, a * 4).transpose(2, 0, 1)[None].copy())
    pl = _ProposalLayer(16, ref_cfg.ANCHOR_SCALES, ref_cfg.ANCHOR_RATIOS)
    with torch.no_grad():
        want = pl((cls_t, dlt_t, torch.from_numpy(im_info), "TEST")).numpy()

    # our side: logits whose softmax reconstructs p exactly (up to 1 ulp)
    logits = np.stack([np.log1p(-p), np.log(p)], axis=-2)  # [H, W, 2, A]
    out = RPNOut(jnp.asarray(logits[None]),
                 jnp.asarray(deltas.reshape(h, w, a * 4)[None]))
    rois = np.asarray(proposal_layer(
        out, shifted_anchors(h, w, 16), jnp.asarray(im_info),
        pre_nms_topk=int(ref_cfg.TEST.RPN_PRE_NMS_TOP_N),
        post_nms_topk=int(ref_cfg.TEST.RPN_POST_NMS_TOP_N),
        nms_thresh=float(ref_cfg.TEST.RPN_NMS_THRESH)))

    assert rois.shape == want.shape == (b, 300, 5)
    np.testing.assert_allclose(rois, want, atol=2e-3,
                               err_msg="proposal rois diverge")


# ---------------------------------------------------------------------------
# Full detector eval forward
# ---------------------------------------------------------------------------

def _fit_params(template, converted):
    """Project the converted tree onto the init-params structure (the
    reference state_dict may carry extra modules our config leaves off)."""
    if not isinstance(template, dict):
        return converted
    return {k: _fit_params(template[k], converted[k]) for k in template}


@pytest.mark.parametrize("flavor", ["voc", "coco", "voc101"])
def test_full_detector_eval_forward_parity(flavor):
    _install_shims()
    if flavor.startswith("voc"):
        from model.faster_rcnn.resnet_sys_transformer_sk_dilat import resnet
    else:  # COCO model: non-local co-attention instead of the MHA pair
        from model.faster_rcnn.resnet_coatt_transformer_sk import resnet
    from model.utils.config import cfg as ref_cfg

    from ait_tpu.config import Config
    from ait_tpu.convert import convert_detector
    from ait_tpu.models import AITDetector
    from ait_tpu.train import init_params

    ref_cfg.POOLING_MODE = "align"  # every shipped recipe (cfgs/*.yml)

    layers = 101 if flavor == "voc101" else 50  # voc101: the res101 recipe
    torch.manual_seed(3)
    ref = resnet(("__background__", "fg"), layers, pretrained=False,
                 class_agnostic=True, num_K=3)
    ref.create_architecture()
    ref.eval()

    h, w, q = 128, 160, 128
    rng = np.random.RandomState(11)
    image = (rng.randn(1, h, w, 3) * 0.6).astype(np.float32)
    query = (rng.randn(1, q, q, 3) * 0.6).astype(np.float32)
    im_info = np.array([[h, w, 1.0]], np.float32)

    with torch.no_grad():
        r_rois, r_cls, r_box = ref(
            torch.from_numpy(image.transpose(0, 3, 1, 2).copy()),
            torch.from_numpy(query.transpose(0, 3, 1, 2).copy()),
            torch.from_numpy(im_info),
            torch.zeros(1, 1, 5), torch.zeros(1))[:3]
    r_rois, r_cls, r_box = (t.numpy() for t in (r_rois, r_cls, r_box))

    cfg = Config()  # defaults ARE the VOC flavor (mha co-attention,
    #                 faithful sk gate, causal mask, softmax dist)
    import dataclasses

    if flavor == "coco":
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, coattention="nonlocal"))
    elif flavor == "voc101":
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, backbone="resnet101"))
    model = AITDetector(cfg, dtype=jnp.float32)
    template = init_params(model, cfg, jax.random.PRNGKey(0))
    params = _fit_params(template, convert_detector(ref.state_dict()))

    out = model.apply(
        {"params": params}, jnp.asarray(image), jnp.asarray(query),
        jnp.asarray(im_info), jnp.zeros((1, cfg.MAX_NUM_GT_BOXES, 5)),
        jnp.zeros((1,), jnp.int32), train=False)
    o_rois = np.asarray(out.rois)
    o_cls = np.asarray(out.cls_prob)
    o_box = np.asarray(out.bbox_pred)

    assert o_rois.shape == r_rois.shape and o_cls.shape == r_cls.shape

    # rows whose rois agree (f32 drift through ~50 layers can flip a
    # score ordering near a NMS/top-k boundary, shifting a row or two —
    # discrete, not numerics); require near-total agreement, then compare
    # the head outputs on the agreeing rows tightly
    row_ok = np.all(np.abs(o_rois - r_rois) < 0.1, axis=-1)  # [B, 300]
    frac = row_ok.mean()
    assert frac >= 0.98, f"only {frac:.1%} of proposal rows agree"

    np.testing.assert_allclose(o_cls[row_ok], r_cls[row_ok],
                               atol=5e-3, err_msg="cls_prob diverges")
    np.testing.assert_allclose(o_box[row_ok], r_box[row_ok],
                               atol=5e-2, err_msg="bbox_pred diverges")
