"""End-to-end TRAIN-step parity of the full detector vs the torch reference.

Completes the parity story of test_e2e_torch_parity.py (which pins the EVAL
forward): here the composed TRAINING path — Siamese backbone, co-attention,
RPN heads + train-config proposal layer (12000/2000), anchor/proposal target
assignment, ROI Align on sampled rois, AIT transformer, SKNet, heads, and all
FIVE losses (rpn CE + rpn smooth-L1(sigma 3) + rcnn CE + 3x margin-ranking +
rcnn smooth-L1; reference faster_rcnn_sys_transformer_sk_dilat.py:292-314,
rpn.py:99-127) — is pinned against the reference for both model flavors.

Randomized target subsampling (np.random in the reference vs jax.random here)
cannot match sequence-for-sequence, so the parity is split exactly as the
round-2 verdict prescribed:

  1. the TARGET LAYERS are compared directly under matched sampling
     decisions — anchor targets with subsampling disabled (RPN_BATCHSIZE >=
     the anchor count makes the reference's np.random.permutation branches
     dead, anchor_target_layer.py:128-150), proposal targets on crafted
     candidates whose sampled multiset is RNG-independent (all bg candidates
     duplicates of one box: floor(rand*n) picks among identical rows,
     proposal_target_layer_cascade.py:175-177; fg count <= 32 so the fg
     permutation only shuffles order, :160-167);

  2. the COMPOSED train forward runs with the reference's captured target
     outputs injected into our step, so both frameworks see identical
     labels/targets/weights and the 5 loss values must agree to float
     tolerance.

  3. the OPTIMIZER is pinned by trajectory: N real SGD steps run in both
     frameworks in lockstep (the reference's per-step captured targets
     injected into ours), and the per-step loss vectors AND the final
     parameter deltas must agree.  This is the only test that executes the
     reference's own torch.optim.SGD with the per-parameter groups of
     trainval_net_voc.py:289-296 (bias lr x(DOUBLE_BIAS+1), BIAS_DECAY
     gating, frozen-BN exclusion, momentum=cfg.TRAIN.MOMENTUM) against
     `ait_tpu.train.make_optimizer`'s optax chain — a wrong decay group or
     momentum semantics would silently break real-data training parity
     while every forward-parity test stayed green.

Together these pin every stage of the training step, update included.
"""

import dataclasses

import numpy as np
import pytest
import torch

import ref_harness

ref_harness.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from test_e2e_torch_parity import _fit_params, _install_shims  # noqa: E402

pytestmark = pytest.mark.slow  # torch reference forward + full-model apply


def _pad_gt(boxes, g=20):
    out = np.zeros((len(boxes), g, 5), np.float32)
    for i, b in enumerate(boxes):
        out[i, : len(b)] = b
    return out


# ---------------------------------------------------------------------------
# 1a. Anchor-target layer, subsampling disabled
# ---------------------------------------------------------------------------

def test_anchor_targets_parity_no_subsample(monkeypatch):
    _install_shims()
    from model.rpn.anchor_target_layer import _AnchorTargetLayer
    from model.utils.config import cfg as ref_cfg

    from ait_tpu.models.targets import anchor_targets
    from ait_tpu.ops.anchors import shifted_anchors

    fh, fw, a = 16, 20, 9
    h, w = fh * 16, fw * 16
    n = fh * fw * a
    # RPN_BATCHSIZE >= anchor count: sum_fg <= num_fg and sum_bg <= num_bg,
    # so the reference's np.random subsample loops never fire
    # (anchor_target_layer.py:128-150) and the output is deterministic.
    monkeypatch.setitem(ref_cfg.TRAIN, "RPN_BATCHSIZE", 4 * n)

    gt = _pad_gt([[[40.0, 50.0, 200.0, 220.0, 1.0],
                   [180.0, 60.0, 310.0, 240.0, 1.0],
                   [20.0, 180.0, 120.0, 250.0, 0.0]]])
    im_info = np.array([[h, w, 1.0]], np.float32)

    layer = _AnchorTargetLayer(16, ref_cfg.ANCHOR_SCALES,
                               ref_cfg.ANCHOR_RATIOS)
    with torch.no_grad():
        r_lab_t, r_tgt_t, r_in_t, r_out_t = layer((
            torch.zeros(1, 2 * a, fh, fw), torch.from_numpy(gt),
            torch.from_numpy(im_info), torch.full((1,), 3)))

    # invert the head layouts (anchor_target_layer.py:179-197) back to flat
    # (y, x, a) anchor order: labels were [B, H, W, A] -> permute(0,3,1,2),
    # the 4-vectors [B, H, W, A*4] (a-major) -> permute(0,3,1,2)
    r_lab = r_lab_t.numpy().reshape(1, a, fh, fw).transpose(0, 2, 3, 1) \
        .reshape(1, n)

    def chan_to_rows(t):
        x = t.numpy().transpose(0, 2, 3, 1)          # [1, fh, fw, 4A]
        return x.reshape(1, fh, fw, a, 4).reshape(1, n, 4)

    r_tgt = chan_to_rows(r_tgt_t)
    r_in = chan_to_rows(r_in_t)
    r_out = chan_to_rows(r_out_t)

    anchors = shifted_anchors(fh, fw, 16)
    ours = anchor_targets(anchors, jnp.asarray(gt), jnp.asarray(im_info),
                          jax.random.PRNGKey(0), batch_size=4 * n)
    o_lab = np.asarray(ours.labels)
    o_tgt = np.asarray(ours.bbox_targets)
    o_in = np.asarray(ours.inside_weights)
    o_out = np.asarray(ours.outside_weights)

    np.testing.assert_array_equal(o_lab, r_lab.astype(np.int32),
                                  err_msg="anchor labels diverge")
    assert (o_lab == 1).sum() > 0 and (o_lab == 0).sum() > 0

    # reference zero-fills targets for outside-image anchors (_unmap fill=0);
    # ours computes them everywhere but weights them out — compare inside
    an = np.asarray(anchors)
    inside = ((an[:, 0] >= 0) & (an[:, 1] >= 0) &
              (an[:, 2] < w) & (an[:, 3] < h))
    np.testing.assert_allclose(o_tgt[:, inside], r_tgt[:, inside], atol=1e-4,
                               err_msg="anchor bbox targets diverge")
    np.testing.assert_allclose(o_in, r_in, atol=0,
                               err_msg="inside weights diverge")
    np.testing.assert_allclose(o_out, r_out, rtol=1e-6,
                               err_msg="outside weights diverge")


# ---------------------------------------------------------------------------
# 1b. Proposal-target layer on RNG-independent candidates
# ---------------------------------------------------------------------------

def test_proposal_targets_parity_deterministic():
    _install_shims()
    from model.rpn.proposal_target_layer_cascade import _ProposalTargetLayer

    from ait_tpu.models.targets import proposal_targets

    # two images; gt has NO padding rows so the candidate set is fully
    # controlled (padding rows would join the bg pool as zero boxes)
    gt = np.array([[[40.0, 50.0, 200.0, 220.0, 1.0],
                    [240.0, 100.0, 300.0, 200.0, 1.0]],
                   [[60.0, 30.0, 180.0, 150.0, 1.0],
                    [200.0, 160.0, 290.0, 230.0, 0.0]]], np.float32)

    def props_for(g):
        fg = [
            [g[0, 0] + 6, g[0, 1] + 8, g[0, 2] - 4, g[0, 3] - 6],  # IoU ~0.85
            [g[1, 0] - 5, g[1, 1] + 3, g[1, 2] - 8, g[1, 3] + 5],  # IoU ~0.7
        ]
        # ONE distinct bg box (IoU in [0.1, 0.5) vs gt[0]), duplicated:
        # with-replacement floor(rand*n) draws then always return this row
        bg_box = [g[0, 0] + 90, g[0, 1] + 100, g[0, 2] + 90, g[0, 3] + 100]
        return np.asarray(fg + [bg_box] * 10, np.float32)

    p = np.stack([props_for(gt[0]), props_for(gt[1])])       # [2, 12, 4]
    rois_in = np.concatenate(
        [np.repeat(np.arange(2.0, dtype=np.float32)[:, None, None], 12, 1),
         p], axis=-1)                                        # [2, 12, 5]

    np.random.seed(5)
    layer = _ProposalTargetLayer(2)
    with torch.no_grad():
        r_rois, r_lab, r_tgt, r_in, r_out = (
            t.numpy() for t in layer(torch.from_numpy(rois_in),
                                     torch.from_numpy(gt),
                                     torch.full((2,), 2)))

    ours = proposal_targets(jnp.asarray(rois_in), jnp.asarray(gt),
                            jax.random.PRNGKey(9))
    o_rois = np.asarray(ours.rois)
    o_lab = np.asarray(ours.labels)
    o_tgt = np.asarray(ours.bbox_targets)
    o_in = np.asarray(ours.inside_weights)
    o_out = np.asarray(ours.outside_weights)

    assert o_rois.shape == r_rois.shape == (2, 128, 5)

    def sort_rows(rois, *rest):
        # fg order is a random permutation on both sides; the sampled
        # MULTISET is deterministic -> compare in canonical row order
        key = np.round(rois.reshape(len(rois), -1, 5), 3)
        order = [np.lexsort(key[b].T[::-1]) for b in range(len(key))]
        take = lambda x: np.stack([x[b][order[b]] for b in range(len(key))])
        return (take(rois),) + tuple(take(x) for x in rest)

    r_rois_s, r_lab_s, r_tgt_s, r_in_s, r_out_s = sort_rows(
        r_rois, r_lab, r_tgt, r_in, r_out)
    o_rois_s, o_lab_s, o_tgt_s, o_in_s, o_out_s = sort_rows(
        o_rois, o_lab, o_tgt, o_in, o_out)

    np.testing.assert_allclose(o_rois_s, r_rois_s, atol=1e-4,
                               err_msg="sampled roi multiset diverges")
    np.testing.assert_array_equal(o_lab_s, r_lab_s.astype(np.int32),
                                  err_msg="roi labels diverge")
    assert (o_lab_s == 1).sum() > 0 and (o_lab_s == 0).sum() > 0
    np.testing.assert_allclose(o_in_s, r_in_s, atol=0,
                               err_msg="inside weights diverge")
    np.testing.assert_allclose(o_out_s, r_out_s, atol=0,
                               err_msg="outside weights diverge")
    # reference zeroes targets on bg rows (:87-98); ours weights them out —
    # compare where the loss can see them
    fg = o_in_s > 0
    np.testing.assert_allclose(o_tgt_s[fg], r_tgt_s[fg], atol=1e-4,
                               err_msg="fg bbox targets diverge")


# ---------------------------------------------------------------------------
# 2. Composed train forward: 5-loss parity with injected reference targets
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("flavor", ["voc", "coco"])
def test_full_detector_train_forward_parity(flavor, monkeypatch):
    _install_shims()
    if flavor == "voc":
        from model.faster_rcnn.resnet_sys_transformer_sk_dilat import resnet
    else:
        from model.faster_rcnn.resnet_coatt_transformer_sk import resnet
    from model.utils.config import cfg as ref_cfg

    from ait_tpu.config import Config
    from ait_tpu.convert import convert_detector
    from ait_tpu.models import AITDetector
    from ait_tpu.models import detector as detector_mod
    from ait_tpu.models.targets import AnchorTargets, ProposalTargets
    from ait_tpu.train import init_params

    ref_cfg.POOLING_MODE = "align"

    torch.manual_seed(3)
    np.random.seed(7)
    ref = resnet(("__background__", "fg"), 50, pretrained=False,
                 class_agnostic=True, num_K=3)
    ref.create_architecture()
    ref.train()  # the resnet subclass re-freezes BN in its train() override
    for m in ref.modules():  # train-mode dropout would desync the comparison
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0

    fh, fw, a = 16, 20, 9
    h, w, q = fh * 16, fw * 16, 128
    rng = np.random.RandomState(11)
    image = (rng.randn(1, h, w, 3) * 0.6).astype(np.float32)
    query = (rng.randn(1, q, q, 3) * 0.6).astype(np.float32)
    im_info = np.array([[h, w, 1.0]], np.float32)
    gt = _pad_gt([[[40.0, 50.0, 200.0, 220.0, 1.0],
                   [180.0, 60.0, 310.0, 240.0, 1.0],
                   [20.0, 180.0, 120.0, 250.0, 0.0]]])

    cap = {}

    rpn = ref.RCNN_rpn
    at_fwd = rpn.RPN_anchor_target.forward
    pt_fwd = ref.RCNN_proposal_target.forward

    def at_hook(inputs):
        out = at_fwd(inputs)
        cap["at"] = [t.detach().clone() for t in out]
        return out

    def pt_hook(rois, gt_boxes, num_boxes):
        cap["rpn_rois"] = rois.detach().clone()
        out = pt_fwd(rois, gt_boxes, num_boxes)
        cap["pt"] = [t.detach().clone() for t in out]
        return out

    monkeypatch.setattr(rpn.RPN_anchor_target, "forward", at_hook)
    monkeypatch.setattr(ref.RCNN_proposal_target, "forward", pt_hook)

    with torch.no_grad():
        r_out = ref(torch.from_numpy(image.transpose(0, 3, 1, 2).copy()),
                    torch.from_numpy(query.transpose(0, 3, 1, 2).copy()),
                    torch.from_numpy(im_info), torch.from_numpy(gt),
                    torch.full((1,), 3))
    r_losses = np.array([float(t) for t in r_out[3:8]])  # rpn_cls, rpn_box,
    #                                             rcnn_cls, margin, rcnn_box

    # ---- convert the captured target-layer outputs to our layouts ----
    n = fh * fw * a

    def chan_to_rows(t):  # [1, 4A, fh, fw] -> [1, N, 4] in (y, x, a) order
        x = t.numpy().transpose(0, 2, 3, 1)
        return jnp.asarray(x.reshape(1, fh, fw, a, 4).reshape(1, n, 4))

    r_lab, r_tgt, r_in, r_wout = cap["at"]
    at_inj = AnchorTargets(
        labels=jnp.asarray(r_lab.numpy().reshape(1, a, fh, fw)
                           .transpose(0, 2, 3, 1).reshape(1, n)
                           .astype(np.int32)),
        bbox_targets=chan_to_rows(r_tgt),
        inside_weights=chan_to_rows(r_in),
        outside_weights=chan_to_rows(r_wout))

    p_rois, p_lab, p_tgt, p_in, p_wout = cap["pt"]
    pt_inj = ProposalTargets(
        rois=jnp.asarray(p_rois.numpy()),
        labels=jnp.asarray(p_lab.numpy().astype(np.int32)),
        bbox_targets=jnp.asarray(p_tgt.numpy()),
        inside_weights=jnp.asarray(p_in.numpy()),
        outside_weights=jnp.asarray(p_wout.numpy()))

    # ---- our side: same params, injected targets ----
    cfg = Config()
    model_kw = dict(t_dropout=0.0)
    if flavor == "coco":
        model_kw["coattention"] = "nonlocal"
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, **model_kw))

    model = AITDetector(cfg, dtype=jnp.float32)
    template = init_params(model, cfg, jax.random.PRNGKey(0))
    params = _fit_params(template, convert_detector(ref.state_dict()))

    monkeypatch.setattr(detector_mod, "anchor_targets",
                        lambda *a, **k: at_inj)
    monkeypatch.setattr(detector_mod, "proposal_targets",
                        lambda *a, **k: pt_inj)
    real_pl = detector_mod.proposal_layer
    our_rois = {}

    def capture_pl(*args, **kw):
        out = real_pl(*args, **kw)
        our_rois["rois"] = np.asarray(out)
        return out

    monkeypatch.setattr(detector_mod, "proposal_layer", capture_pl)

    out = model.apply(
        {"params": params}, jnp.asarray(image), jnp.asarray(query),
        jnp.asarray(im_info), jnp.asarray(gt), jnp.full((1,), 3, jnp.int32),
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1),
              "sampling": jax.random.PRNGKey(2)})
    o_losses = np.array([float(out.rpn_loss_cls), float(out.rpn_loss_box),
                         float(out.rcnn_loss_cls), float(out.margin_loss),
                         float(out.rcnn_loss_bbox)])

    # train-config proposal layer (12000/2000 + zero-padding).  A random-init
    # net on noise gives near-tie RPN scores (especially the coco flavor,
    # whose 'division' co-attention shrinks feature variance), so f32 drift
    # reorders the sort and greedy NMS cascades — POSITIONAL agreement is
    # tie-chaotic at this config.  Compare order-independently instead: each
    # row must appear (within 0.1 px) somewhere in the other side's rows.
    r_rois = cap["rpn_rois"].numpy()
    o_rois_pl = our_rois["rois"]
    assert o_rois_pl.shape == r_rois.shape == (1, 2000, 5)
    d = np.abs(o_rois_pl[0, :, None, :] - r_rois[0, None, :, :]).max(-1)
    matched = (d.min(axis=1) < 0.1).mean()      # ours covered by reference
    matched_r = (d.min(axis=0) < 0.1).mean()    # reference covered by ours
    assert min(matched, matched_r) >= 0.97, \
        f"train proposal sets diverge: ours-in-ref {matched:.1%}, " \
        f"ref-in-ours {matched_r:.1%}"

    assert np.all(np.isfinite(o_losses)) and np.all(o_losses > 0)
    np.testing.assert_allclose(
        o_losses, r_losses, rtol=5e-3, atol=2e-3,
        err_msg=f"5-loss vector diverges: ours={o_losses} ref={r_losses}")


# ---------------------------------------------------------------------------
# 3. Multi-step SGD trajectory: optimizer parity (groups, decay, momentum)
# ---------------------------------------------------------------------------

def _reference_sgd(ref_model, ref_cfg, lr):
    """The reference's optimizer, built by its own rules
    (trainval_net_voc.py:289-296): one group per tensor; params whose NAME
    contains 'bias' get lr x (DOUBLE_BIAS + 1) and weight decay only when
    BIAS_DECAY; everything else lr + WEIGHT_DECAY; requires_grad=False
    excluded entirely; SGD momentum = cfg.TRAIN.MOMENTUM (0.9), no nesterov.
    """
    groups = []
    for name, p in ref_model.named_parameters():
        if not p.requires_grad:
            continue
        is_bias = "bias" in name
        groups.append({
            "params": [p],
            "lr": lr * (ref_cfg.TRAIN.DOUBLE_BIAS + 1) if is_bias else lr,
            "weight_decay": (ref_cfg.TRAIN.WEIGHT_DECAY
                             if (not is_bias or ref_cfg.TRAIN.BIAS_DECAY)
                             else 0.0),
        })
    return torch.optim.SGD(groups, momentum=ref_cfg.TRAIN.MOMENTUM)


def test_multistep_sgd_trajectory_parity(monkeypatch):
    """Run 3 lockstep SGD steps in both frameworks; per-step targets are
    captured from the reference and injected into our step so both sides
    differentiate the identical objective — then per-step losses and the
    final parameter DELTAS must match, which pins gradients, per-group
    lr/decay, and the momentum buffer semantics end to end."""
    _install_shims()
    from model.faster_rcnn.resnet_sys_transformer_sk_dilat import resnet
    from model.utils.config import cfg as ref_cfg

    from ait_tpu.config import Config
    from ait_tpu.convert import convert_detector
    from ait_tpu.models import AITDetector
    from ait_tpu.models import detector as detector_mod
    from ait_tpu.models.targets import AnchorTargets, ProposalTargets
    from ait_tpu.train import TrainState, init_params, make_optimizer

    ref_cfg.POOLING_MODE = "align"
    n_steps, lr = 3, 0.01  # recipe lr (train_voc.sh)

    torch.manual_seed(3)
    np.random.seed(7)
    ref = resnet(("__background__", "fg"), 50, pretrained=False,
                 class_agnostic=True, num_K=3)
    ref.create_architecture()
    ref.train()
    for m in ref.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    opt = _reference_sgd(ref, ref_cfg, lr)

    fh, fw, a = 16, 20, 9
    h, w, q = fh * 16, fw * 16, 128
    rng = np.random.RandomState(11)
    image = (rng.randn(1, h, w, 3) * 0.6).astype(np.float32)
    query = (rng.randn(1, q, q, 3) * 0.6).astype(np.float32)
    im_info = np.array([[h, w, 1.0]], np.float32)
    gt = _pad_gt([[[40.0, 50.0, 200.0, 220.0, 1.0],
                   [180.0, 60.0, 310.0, 240.0, 1.0],
                   [20.0, 180.0, 120.0, 250.0, 0.0]]])

    # per-step target capture (re-captured every reference forward)
    cap = {}
    rpn = ref.RCNN_rpn
    at_fwd = rpn.RPN_anchor_target.forward
    pt_fwd = ref.RCNN_proposal_target.forward
    monkeypatch.setattr(
        rpn.RPN_anchor_target, "forward",
        lambda inputs: cap.__setitem__(
            "at", [t.detach().clone() for t in at_fwd(inputs)]) or cap["at"])

    def pt_hook(rois, gt_boxes, num_boxes):
        out = pt_fwd(rois, gt_boxes, num_boxes)
        cap["pt"] = [t.detach().clone() for t in out]
        return out

    monkeypatch.setattr(ref.RCNN_proposal_target, "forward", pt_hook)

    # ---- our side: converted params, real optimizer, injected targets ----
    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model, t_dropout=0.0))
    model = AITDetector(cfg, dtype=jnp.float32)
    template = init_params(model, cfg, jax.random.PRNGKey(0))
    # convert_detector leaves can be numpy VIEWS of the live torch storage
    # (Tensor.numpy() shares memory), and jnp.asarray on the CPU backend
    # ZERO-COPIES aligned numpy arrays — so snapshot through an explicit
    # np.array copy or opt.step() mutates our params in place mid-trajectory
    params0 = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.array(x, copy=True)),
        _fit_params(template, convert_detector(ref.state_dict())))

    tx = make_optimizer(cfg, lr)
    state = TrainState.create(params0, tx)

    inj = {}
    n = fh * fw * a

    def chan_to_rows(t):
        x = t.numpy().transpose(0, 2, 3, 1)
        return jnp.asarray(x.reshape(1, fh, fw, a, 4).reshape(1, n, 4))

    monkeypatch.setattr(detector_mod, "anchor_targets",
                        lambda *a_, **k_: inj["at"])
    monkeypatch.setattr(detector_mod, "proposal_targets",
                        lambda *a_, **k_: inj["pt"])
    # pt is injected wholesale, so the proposal layer's output is dead code
    # on our side (both frameworks stop gradients at the proposals) — stub
    # it to skip the NMS fixpoint under eager autodiff
    monkeypatch.setattr(detector_mod, "proposal_layer",
                        lambda *a_, **k_: jnp.zeros((1, 2000, 5),
                                                    jnp.float32))

    def loss_fn(p):
        out = model.apply(
            {"params": p}, jnp.asarray(image), jnp.asarray(query),
            jnp.asarray(im_info), jnp.asarray(gt),
            jnp.full((1,), 3, jnp.int32), train=True,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "sampling": jax.random.PRNGKey(2)})
        return out.total_loss, out

    im_t = torch.from_numpy(image.transpose(0, 3, 1, 2).copy())
    q_t = torch.from_numpy(query.transpose(0, 3, 1, 2).copy())
    info_t = torch.from_numpy(im_info)
    gt_t = torch.from_numpy(gt)
    nb_t = torch.full((1,), 3)

    for step in range(n_steps):
        # reference step (captures this step's sampled targets)
        opt.zero_grad()
        r_out = ref(im_t, q_t, info_t, gt_t, nb_t)
        r_losses = np.array([float(t.mean()) for t in r_out[3:8]])
        cost = sum(t.mean() for t in r_out[3:8])
        cost.backward()
        opt.step()

        # our step on the identical objective
        r_lab, r_tgt, r_in, r_wout = cap["at"]
        inj["at"] = AnchorTargets(
            labels=jnp.asarray(r_lab.numpy().reshape(1, a, fh, fw)
                               .transpose(0, 2, 3, 1).reshape(1, n)
                               .astype(np.int32)),
            bbox_targets=chan_to_rows(r_tgt),
            inside_weights=chan_to_rows(r_in),
            outside_weights=chan_to_rows(r_wout))
        p_rois, p_lab, p_tgt, p_in, p_wout = cap["pt"]
        inj["pt"] = ProposalTargets(
            rois=jnp.asarray(p_rois.numpy()),
            labels=jnp.asarray(p_lab.numpy().astype(np.int32)),
            bbox_targets=jnp.asarray(p_tgt.numpy()),
            inside_weights=jnp.asarray(p_in.numpy()),
            outside_weights=jnp.asarray(p_wout.numpy()))

        (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        o_losses = np.array([float(out.rpn_loss_cls),
                             float(out.rpn_loss_box),
                             float(out.rcnn_loss_cls),
                             float(out.margin_loss),
                             float(out.rcnn_loss_bbox)])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(step=state.step + 1, params=new_params,
                              opt_state=opt_state)

        # tolerance widens with accumulated f32 trajectory drift
        tol = 5e-3 * (1 + 2 * step)
        np.testing.assert_allclose(
            o_losses, r_losses, rtol=tol, atol=tol,
            err_msg=f"step {step} loss vector diverges: "
                    f"ours={o_losses} ref={r_losses}")

    # ---- final parameter deltas ----
    r_final = _fit_params(template, convert_detector(ref.state_dict()))
    flat0 = jax.tree_util.tree_leaves_with_path(params0)
    flat_o = dict(jax.tree_util.tree_leaves_with_path(state.params))
    flat_r = dict(jax.tree_util.tree_leaves_with_path(r_final))

    # f32 trajectory drift puts a ~5-10% noise floor on elementwise delta
    # comparison after 3 steps (deep-backbone grads, catastrophic
    # cancellation); semantics errors look different — a wrong group lr /
    # decay / momentum shifts the delta NORM (e.g. DOUBLE_BIAS off = 2x) and
    # a wrong objective shifts the DIRECTION — so gate norm ratio and cosine
    # per leaf.  (Exact-arithmetic optimizer parity is pinned separately by
    # test_optim_parity.py on a synthetic tree.)
    checked = moved = 0
    bad = []
    for path, p0 in flat0:
        od = np.asarray(flat_o[path] - p0).ravel()
        rd = (np.asarray(flat_r[path]) - np.asarray(p0)).ravel()
        rn, on = float(np.linalg.norm(rd)), float(np.linalg.norm(od))
        name = jax.tree_util.keystr(path)
        checked += 1
        if rn < 1e-10:
            # untouched in the reference (frozen) -> must be untouched here
            if on > 1e-8:
                bad.append(f"{name}: ref frozen but ours moved ({on:.2e})")
            continue
        moved += 1
        ratio = on / rn
        cos = float(np.dot(od, rd)) / max(on * rn, 1e-30)
        if not (0.93 < ratio < 1.07) or cos < 0.98:
            bad.append(f"{name}: delta norm ratio {ratio:.3f} cos {cos:.4f} "
                       f"(|ref|={rn:.2e} |ours|={on:.2e})")
    assert moved > 50, f"suspiciously few trained tensors: {moved}/{checked}"
    assert not bad, "optimizer trajectory diverges:\n" + "\n".join(bad[:20])
