"""Cross-framework SYSTEM parity on a synthetic VOC devkit.

The strongest available proxy for real-data AP parity while datasets and
released checkpoints are unreachable: both frameworks run their OWN full
pipeline — disk -> data layer -> model -> postprocess -> evaluator — on the
same synthetic devkit, and the results are compared stage by stage:

1. `test_data_layer_eval_parity` — the reference's `roibatchLoader`
   (roi_data_layer/roibatchLoader.py:277-331) vs our `OneShotLoader` test
   items at the real 600-scale: image pixels, query pixels, im_info, and
   the (image, class) pair enumeration.  This is the one pipeline stage
   prior rounds never executed against the reference's code.
2. `test_data_layer_train_parity` — train items under injected (forced)
   sampling decisions: class-filtered gt, binary relabel, query crop,
   scaled gt boxes, MAX_NUM_GT_BOXES padding
   (roibatchLoader.py:97-270, blob.py:35-100).
3. `test_full_system_eval_parity` — the reference's eval protocol
   (test_net_voc.py:320-496: forward, delta unnormalize, decode, clip,
   rescale, threshold, sort, NMS, top-100, evaluate_detections) driven over
   its own data layer with random-init torch weights, vs `tools/test_net.py`
   run end to end on the SAME devkit with the SAME converted weights saved
   as an orbax checkpoint.  Asserts per-(class, image) detections agree and
   the mAPs match, plus a float-drift-free cross-evaluator gate: our
   `evaluate_voc` on the REFERENCE's detections equals the reference's own
   `_do_python_eval` APs.

Everything reference-side runs on torch CPU under tests/ref_harness.py with
the exact CPU shims from test_e2e_torch_parity (greedy +1-convention NMS,
the golden-tested adaptive ROI Align port).
"""

import os
import pickle
import random as pyrandom
import sys

import numpy as np
import pytest
import torch

import ref_harness

ref_harness.install()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from fixtures import VOC_FIXTURE, make_voc_devkit  # noqa: E402
from test_e2e_torch_parity import _fit_params, _install_shims  # noqa: E402

pytestmark = pytest.mark.slow  # torch reference pipeline + full CLI runs


# ---------------------------------------------------------------------------
# Reference-side helpers
# ---------------------------------------------------------------------------

def _ref_cfg():
    from model.utils.config import cfg
    return cfg


def _ref_dataset(tmp_path, *, training, seen, scales=(600,),
                 use_flipped=False):
    """combined_roidb + roibatchLoader on the synthetic tree (bs=1)."""
    cfg = _ref_cfg()
    cfg.DATA_DIR = str(tmp_path)
    cfg.TRAIN.SCALES = scales
    cfg.TEST.SCALES = scales
    cfg.TRAIN.USE_FLIPPED = use_flipped
    # pascal_voc.__init__ reads ./experiment.info (pascal_voc.py:76-80);
    # no trailing newline — the comp-id lands in result-file names
    with open("experiment.info", "w") as f:
        f.write("system_parity")
    # the harness stubs lib.ops.utils.mkdir, so precreate the devkit
    # results dir the reference's writer expects (pascal_voc.py:303-309)
    os.makedirs(os.path.join(str(tmp_path), "VOCdevkit2007", "results",
                             "VOC2007", "Main"), exist_ok=True)

    from roi_data_layer.roibatchLoader import roibatchLoader
    from roi_data_layer.roidb import combined_roidb

    imdb, roidb, ratio_list, ratio_index, query = combined_roidb(
        "voc_2007_test", training, seen=seen)
    ds = roibatchLoader(roidb, ratio_list, ratio_index, query, 1,
                        imdb.num_classes, training=training, seen=seen)
    return imdb, ds, ratio_index


def _rec_name(rec):
    return os.path.splitext(os.path.basename(rec.image_path))[0]


def _our_view_and_loader(tmp_path, cfg, *, training, seen):
    from ait_tpu.data import OneShotLoader
    from ait_tpu.data import voc as voc_data

    view = voc_data.load_voc(str(tmp_path / "VOCdevkit2007"), "2007", "test")
    view = voc_data.filter_seen(view, seen)
    return view, OneShotLoader(view, cfg, training=training)


def _float_cfg(overrides=()):
    """Config in exact-parity mode: float images normalized on host, no
    space-to-depth, full 600-scale canvas."""
    from ait_tpu.config import Config
    return Config().override([
        "tpu.input_uint8", "False",
        "tpu.host_s2d", "False",
        *overrides,
    ])


# ---------------------------------------------------------------------------
# 1. Data layer, eval mode (deterministic: seed-by-img-id query shots)
# ---------------------------------------------------------------------------

def test_data_layer_eval_parity(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_voc_devkit(str(tmp_path / "VOCdevkit2007"))
    _install_shims()
    imdb, ref_ds, ratio_index = _ref_dataset(tmp_path, training=False,
                                             seen=2)
    cfg = _float_cfg()
    view, loader = _our_view_and_loader(tmp_path, cfg, training=False,
                                        seen=2)

    # pair enumeration parity: (image name, class) lists must be identical
    # (test_rank_roidb_ratio, roidb.py:91-128 vs OneShotLoader.pairs)
    ref_pairs = [(imdb.image_index[int(ratio_index[0][i])],
                  int(ratio_index[1][i]))
                 for i in range(len(ratio_index[0]))]
    our_pairs = [(_rec_name(view.records[ri]), ci)
                 for ri, ci in loader.pairs]
    assert ref_pairs == our_pairs

    for qpos in range(2):
        ref_ds.query_position = qpos
        loader.query_position = qpos
        for pi in range(len(our_pairs)):
            r_img, r_query, r_info, _r_gt, r_choice = ref_ds[pi]
            ours = loader.test_item(pi)
            assert int(r_choice) == int(ours["category"])

            # im_info: [scaled H, scaled W, scale]
            r_info = r_info.numpy().reshape(-1)
            np.testing.assert_allclose(ours["im_info"], r_info, rtol=1e-6)

            # image: the reference emits the bare scaled image (CHW); ours
            # is placed top-left on the static canvas — compare the live
            # region, zero elsewhere
            h, w = int(r_info[0]), int(r_info[1])
            r_img = r_img.numpy().transpose(1, 2, 0)  # HWC
            assert r_img.shape[:2] == (h, w)
            canvas = ours["image"]
            np.testing.assert_allclose(canvas[:h, :w], r_img, atol=1e-5)
            assert np.all(canvas[h:] == 0) and np.all(canvas[:, w:] == 0)

            # query: 128x128 crop, identical pipeline
            r_query = r_query.numpy().transpose(1, 2, 0)
            np.testing.assert_allclose(ours["query"], r_query, atol=1e-5)


# ---------------------------------------------------------------------------
# 2. Data layer, train mode (injected sampling decisions)
# ---------------------------------------------------------------------------

class _ForcedRng:
    """Deterministic stand-in for the loader's np.random.RandomState:
    first candidate, no flip, no shuffle — matching the forced reference
    decisions below."""

    def choice(self, cand, n=1, p=None):
        return np.asarray([cand[0]])

    def randint(self, n):
        return 0

    def rand(self):
        return 0.0  # > 0.5 is False -> no query flip

    def shuffle(self, x):
        return None


# one image per seen class (the reference's inverse-frequency table
# divides by each seen class's count, roibatchLoader.py:365-383, so every
# class must appear); image 17 carries a seen + an unseen box to pin the
# allowed-class gt filter (roibatchLoader.py:107-108)
_SEEN_16 = ["pottedplant", "sofa", "tvmonitor", "car", "bottle", "boat",
            "chair", "person", "bus", "train", "horse", "bicycle", "dog",
            "bird", "motorbike", "diningtable"]
TRAIN_FIXTURE = [
    (f"{i + 1:06d}", 100 + 7 * (i % 3), 80 + 9 * (i % 4),
     [(cls, 10 + i, 8 + i, 60 + i, 58 + i, 0)])
    for i, cls in enumerate(_SEEN_16)
] + [
    ("000017", 120, 95, [("dog", 12, 10, 70, 80, 0),
                         ("cat", 30, 20, 90, 88, 0)]),
]


@pytest.mark.parametrize("use_flipped", [False, True])
def test_data_layer_train_parity(tmp_path, monkeypatch, use_flipped):
    """Train items item-for-item vs the reference loader under forced
    sampling — with use_flipped=True this also pins the one data-layer
    knob the recipe trains with: append_flipped_images' doubled roidb with
    x2 = W - 1 - x1 box mirroring (imdb.py:114-129) and the loader's
    flipped-image branch (minibatch.py vs loader._prep_image)."""
    monkeypatch.chdir(tmp_path)
    make_voc_devkit(str(tmp_path / "VOCdevkit2007"), fixture=TRAIN_FIXTURE)
    _install_shims()

    # force the reference's python-random draws: first exemplar, no hflip
    # (roibatchLoader.load_query: random.choice :292, random.randint :321)
    monkeypatch.setattr(pyrandom, "choice", lambda seq: seq[0])
    monkeypatch.setattr(pyrandom, "randint", lambda a, b: 0)
    # and the numpy draws: identity gt shuffle (:140), first class choice
    monkeypatch.setattr(np.random, "shuffle", lambda x: None)
    _orig_choice = np.random.choice
    monkeypatch.setattr(
        np.random, "choice",
        lambda cand, n=1, p=None: np.asarray([cand[0]])
        if p is not None else _orig_choice(cand, n))

    imdb, ref_ds, ratio_index = _ref_dataset(tmp_path, training=True,
                                             seen=1,
                                             use_flipped=use_flipped)
    cfg = _float_cfg(["TRAIN.USE_FLIPPED", repr(use_flipped)])
    view, loader = _our_view_and_loader(tmp_path, cfg, training=True,
                                        seen=1)
    loader.rng = _ForcedRng()

    # map: reference train item i reads roidb[ratio_index[i]] (training
    # ratio_index is the flat aspect-ratio sort order, roidb.py:50-74);
    # align by (image name, flipped) — append_flipped doubles image_index
    # in place (imdb.py:129) and appends flipped roidb rows in order
    ref_order = [(imdb.image_index[int(ratio_index[i])],
                  bool(imdb.roidb[int(ratio_index[i])].get("flipped")))
                 for i in range(len(ratio_index))]
    our_by_img = {(_rec_name(view.records[i]), bool(view.records[i].flipped)):
                  i for i in range(len(view.records))}
    assert sorted(ref_order) == sorted(our_by_img)
    if use_flipped:
        assert sum(f for _, f in ref_order) == len(ref_order) // 2

    for i, img_key in enumerate(ref_order):
        r_img, r_query, r_info, r_gt, r_n = ref_ds[i]
        ours = loader.train_item(our_by_img[img_key])

        r_info = r_info.numpy().reshape(-1)
        # the reference pads H or W up to the batch target ratio with
        # ceil(); at bs=1 the target IS the image's own ratio so the pad is
        # at most one row/column of zeros.  Compare the true scaled dims.
        h, w = int(ours["im_info"][0]), int(ours["im_info"][1])
        assert abs(int(r_info[0]) - h) <= 1 and abs(int(r_info[1]) - w) <= 1
        np.testing.assert_allclose(ours["im_info"][2], r_info[2], rtol=1e-6)

        r_img = r_img.numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours["image"][:h, :w], r_img[:h, :w],
                                   atol=1e-5)

        r_query = r_query.numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours["query"], r_query, atol=1e-5)

        # gt: class-filtered, binary-relabeled, scaled, padded to
        # MAX_NUM_GT_BOXES
        np.testing.assert_array_equal(int(ours["num_boxes"]), int(r_n))
        np.testing.assert_allclose(ours["gt_boxes"], r_gt.numpy(),
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# 3. Full system: reference eval protocol vs tools/test_net.py
# ---------------------------------------------------------------------------

# Every image exactly fills the (128, 160) canvas at TEST.SCALES=(128,)
# (scale 1.0, zero resize, zero padding).  Necessary for a meaningful
# random-weight comparison: the reference runs each image at its exact
# scaled shape while we run on a static padded canvas, and with a ~100 px
# image the deep backbone's receptive field puts EVERY feature cell within
# reach of the canvas halo, where "zero-pad once at the input" (ours) and
# "zero-pad at every conv" (torch's implicit padding) genuinely differ.
# With trained weights this is an edge effect; with random flat scores it
# reorders every NMS decision.  Scale-1.0 images remove the halo entirely
# — the resize/canvas quirks are pinned separately by the data-layer tests
# above.
SYS_FIXTURE = [
    ("000001", 160, 128, [("cat", 16, 16, 96, 112, 0),
                          ("dog", 48, 32, 144, 120, 0)]),
    ("000002", 160, 128, [("cow", 7, 7, 67, 85, 0),
                          ("cow", 80, 14, 147, 114, 0),
                          ("car", 27, 43, 93, 121, 1)]),
    ("000003", 160, 128, [("sheep", 21, 17, 124, 105, 0)]),
    ("000004", 160, 128, [("dog", 13, 10, 88, 84, 0),
                          ("person", 64, 15, 152, 121, 0)]),
    ("000005", 160, 128, [("aeroplane", 22, 14, 128, 105, 0),
                          ("cat", 32, 27, 96, 116, 0)]),
]

def _ref_run_protocol(imdb, ds, ratio_index, model, n_shots, thresh=0.0,
                      max_per_image=100):
    """The reference's test loop, exactly as test_net_voc.py:320-496 (the
    loop itself lives in __main__ there, so it is re-driven here using the
    reference's own library functions for every stage)."""
    from model.rpn.bbox_transform import bbox_transform_inv, clip_boxes
    from model.utils.config import cfg

    per_shot = []
    for avg in range(n_shots):
        ds.query_position = avg
        all_boxes = [[[] for _ in range(len(imdb.image_index))]
                     for _ in range(imdb.num_classes)]
        for i in range(len(ratio_index[0])):
            index = int(ratio_index[0][i])
            data = ds[i]
            im_data = data[0][None]
            query = data[1][None]
            im_info = data[2].reshape(1, 3)
            gt_boxes = data[3][None]
            catgory = int(data[4])
            with torch.no_grad():
                rois, cls_prob, bbox_pred = model(
                    im_data, query, im_info, gt_boxes,
                    torch.tensor([catgory]))[:3]
            scores = cls_prob.data
            boxes = rois.data[:, :, 1:5]
            box_deltas = bbox_pred.data.view(-1, 4) \
                * torch.FloatTensor(cfg.TRAIN.BBOX_NORMALIZE_STDS) \
                + torch.FloatTensor(cfg.TRAIN.BBOX_NORMALIZE_MEANS)
            box_deltas = box_deltas.view(1, -1, 4)
            pred_boxes = bbox_transform_inv(boxes, box_deltas, 1)
            pred_boxes = clip_boxes(pred_boxes, im_info.data, 1)
            pred_boxes /= float(im_info[0][2])
            scores = scores.squeeze()
            pred_boxes = pred_boxes.squeeze()

            inds = torch.nonzero(scores > thresh).view(-1)
            if inds.numel() > 0:
                cls_scores = scores[inds]
                cls_boxes = pred_boxes[inds, :]
                cls_dets = torch.cat(
                    (cls_boxes, cls_scores.unsqueeze(1)), 1)
                _, order = torch.sort(cls_scores, 0, True)
                cls_dets = cls_dets[order]
                from test_e2e_torch_parity import _greedy_nms
                keep = _greedy_nms(cls_boxes[order, :], cls_scores[order],
                                   cfg.TEST.NMS)
                cls_dets = cls_dets[keep.view(-1).long()]
                all_boxes[catgory][index] = cls_dets.cpu().numpy()
            if max_per_image > 0:
                try:
                    image_scores = all_boxes[catgory][index][:, -1]
                    if len(image_scores) > max_per_image:
                        image_thresh = np.sort(image_scores)[-max_per_image]
                        keep = np.where(all_boxes[catgory][index][:, -1]
                                        >= image_thresh)[0]
                        all_boxes[catgory][index] = \
                            all_boxes[catgory][index][keep, :]
                except Exception:
                    pass
        per_shot.append(all_boxes)
    return per_shot


def test_full_system_eval_parity(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_voc_devkit(str(tmp_path / "VOCdevkit2007"), fixture=SYS_FIXTURE)
    _install_shims()

    small = [
        "TEST.SCALES", "(128,)",
        "TEST.RPN_PRE_NMS_TOP_N", "256",
        "TEST.RPN_POST_NMS_TOP_N", "32",
    ]
    ref_cfg = _ref_cfg()
    ref_cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    ref_cfg.TEST.RPN_POST_NMS_TOP_N = 32
    ref_cfg.POOLING_MODE = "align"
    imdb, ref_ds, ratio_index = _ref_dataset(tmp_path, training=False,
                                             seen=2, scales=(128,))

    from model.faster_rcnn.resnet_sys_transformer_sk_dilat import resnet

    torch.manual_seed(3)
    ref_model = resnet(imdb.classes, 50, pretrained=False,
                       class_agnostic=True, num_K=3)
    ref_model.create_architecture()
    ref_model.eval()

    n_shots = 2
    ref_shots = _ref_run_protocol(imdb, ref_ds, ratio_index, ref_model,
                                  n_shots)
    # The reference proposal layer zero-pads its output when NMS keeps
    # fewer than POST_NMS_TOP_N rois (proposal_layer.py:146-156); a zero
    # roi decodes to a ~1 px box at the origin that survives the final NMS
    # as a spurious 0.5-score detection.  At production scale (6000 -> 300
    # with thousands of proposals) the pad branch never fires; it only
    # manifests at this test's tiny 256 -> 32 sizes.  Our postprocess
    # (correctly) drops padded rois via the valid mask, so strip the
    # artifact from the reference's detections before comparing.
    def _strip_pad_artifact(all_boxes):
        for per_cls in all_boxes:
            for i, dets in enumerate(per_cls):
                if len(dets):
                    d = np.asarray(dets)
                    per_cls[i] = d[~((d[:, 0] < 1e-3) & (d[:, 2] < 2.0)
                                     & (d[:, 3] < 2.0))]
    for all_boxes in ref_shots:
        _strip_pad_artifact(all_boxes)
    ref_maps = []
    # the reference's cleanup branch os.removes a filename its own writer
    # never creates (pascal_voc.py:441-442 formats a template that has no
    # placeholder) — disable it, as any successful run of the reference must
    imdb.config["cleanup"] = False
    for all_boxes in ref_shots:
        aps = imdb.evaluate_detections(all_boxes, str(tmp_path / "refout"),
                                       save_results=False)
        ref_maps.append(float(np.mean(aps)))

    # ---- our side: convert the SAME weights, save an orbax ckpt, run the
    # CLI end to end on the same tree
    import jax
    import jax.numpy as jnp

    from ait_tpu.config import Config
    from ait_tpu.convert import convert_detector
    from ait_tpu.models import AITDetector
    from ait_tpu.train import (TrainState, init_params, lr_schedule,
                               make_optimizer)
    from ait_tpu.train.checkpoint import CheckpointManager, save_config

    cfg = Config().override([
        "tpu.input_uint8", "False",
        "tpu.host_s2d", "False",
        "tpu.compute_dtype", "float32",
        "tpu.image_size", "(128, 160)",
        *small,
    ])
    model = AITDetector(cfg, dtype=jnp.float32)
    template = init_params(model, cfg, jax.random.PRNGKey(0))
    params = _fit_params(template, convert_detector(ref_model.state_dict()))

    run_dir = tmp_path / "models" / "res50" / "pascal_voc" / "parity"
    os.makedirs(run_dir, exist_ok=True)
    tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
    mgr = CheckpointManager(str(run_dir / "ckpt"))
    mgr.save(1, TrainState.create(params, tx))
    save_config(str(run_dir), cfg)

    import test_net as cli

    out_dir = str(tmp_path / "output")
    results = cli.main([
        "--dataset", "pascal_voc", "--net", "res50",
        "--data_dir", str(tmp_path), "--seen", "2", "--a", str(n_shots),
        "--bs", "2", "--nw", "0",
        "--checkpoint_path", str(run_dir / "ckpt"),
        "--output_dir", out_dir,
        "--set",
        "tpu.input_uint8", "False",
        "tpu.host_s2d", "False",
        "tpu.compute_dtype", "float32",
        "tpu.image_size", "(128, 160)",
        *small,
    ])
    assert len(results) == n_shots

    # ---- detection-level parity, keyed by (class, image name)
    from ait_tpu.data import voc as voc_data
    view = voc_data.load_voc(str(tmp_path / "VOCdevkit2007"), "2007",
                             "test")
    view = voc_data.filter_seen(view, 2)
    name_of_rec = [_rec_name(r) for r in view.records]

    total = agree = 0
    for avg in range(n_shots):
        with open(os.path.join(out_dir, f"sess1_seen2_{avg}.pkl"),
                  "rb") as f:
            ours = pickle.load(f)
        ref_boxes = ref_shots[avg]
        for ci, per_rec in ours.items():
            for ri, dets in per_rec.items():
                img_idx = imdb.image_index.index(name_of_rec[ri])
                ref_dets = np.asarray(ref_boxes[ci][img_idx],
                                      np.float32).reshape(-1, 5)
                dets = np.asarray(dets, np.float32).reshape(-1, 5)
                total += 1
                if dets.shape == ref_dets.shape and np.allclose(
                        dets, ref_dets, atol=0.1):
                    agree += 1
    assert total > 0
    frac = agree / total
    assert frac >= 0.9, f"only {frac:.1%} of per-pair detections agree"

    # ---- end-to-end mAP parity (float drift can flip an NMS/order
    # boundary on a tiny set; the detections gate above bounds it)
    for avg in range(n_shots):
        assert abs(results[avg]["mAP"] - ref_maps[avg]) < 0.02, (
            f"shot {avg}: ours {results[avg]['mAP']:.4f} "
            f"vs ref {ref_maps[avg]:.4f}")

    # ---- drift-free cross-EVALUATOR gate: our evaluator on the
    # REFERENCE's detections must reproduce the reference's APs exactly
    from ait_tpu.evaluation import evaluate_voc
    rec_of_name = {n: i for i, n in enumerate(name_of_rec)}
    for avg in range(n_shots):
        ref_as_ours = {ci: {} for ci in view.allowed_classes}
        for ci in view.allowed_classes:
            for img_idx, name in enumerate(imdb.image_index):
                dets = ref_shots[avg][ci][img_idx]
                if len(dets):
                    ref_as_ours[ci][rec_of_name[name]] = np.asarray(dets)
        # file_quantize replicates the reference's %.3f/%.1f result-file
        # round trip, which reorders near-tied scores — required for a
        # bit-exact comparison (ait_tpu/evaluation/voc_eval.py)
        res = evaluate_voc(ref_as_ours, view.records, view.allowed_classes,
                           voc_data.class_order(2), file_quantize=True)
        assert abs(res["mAP"] - ref_maps[avg]) < 1e-8, (
            f"evaluator mismatch: {res['mAP']} vs {ref_maps[avg]}")
