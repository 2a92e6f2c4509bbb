"""Cross-framework SYSTEM parity on a synthetic COCO devkit.

Extends tests/test_system_parity.py (the strongest real-data proxy while
datasets/checkpoints are unreachable) to the second headline dataset family:
the reference's OWN coco pipeline — coco imdb with the hardcoded 80-cat-id
table and the Mask-R-CNN reference-pkl query gating
(lib/datasets/coco.py:92-99,183-246), roibatchLoader's coco branch
(roibatchLoader.py:71-95,337-354), the test_net_coco.py protocol, and
customCOCOeval.summarize(class_index) over onlineRes (coco.py:313-417) —
runs end to end on a synthetic 80-category devkit with random-init torch
weights, against `tools/test_net.py --dataset coco` with the SAME converted
weights.

Gate structure differs deliberately from the VOC system test.  The COCO
flavor's 'division' co-attention shrinks feature variance so much that a
random-init model's anchor-score spread (~2e-4) is the same size as the
cross-framework f32 drift seeded by 1-ulp normalization differences —
proposal orderings are mutually TIE-CHAOTIC, so exact per-row detection
equality is unattainable by construction (measured: ref-vs-ours objectness
0.09212 vs 0.09235 on identical pair inputs whose pixels differ by 5e-7).
The gates are therefore: (1) bit-level DATA-LAYER parity per pair item,
(2) exact pair-enumeration equality, (3) tie-tolerant detection matching
(greedy IoU + score match), (4) AP50/AP agreement to a tolerance, and
(5) a float-drift-free cross-EVALUATOR gate: our COCODetEval on the
reference's own detections must reproduce customCOCOeval's class-restricted
stats exactly.

Reference-side COCOeval runs on the VENDORED pycocotools sources (REF_LIB on
sys.path) with ref_harness's real numpy `_mask.iou` standing in for the
unbuilt Cython kernel.
"""

import os
import pickle
import sys

import numpy as np
import pytest
import torch

import ref_harness

ref_harness.install()

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from fixtures import make_coco_devkit  # noqa: E402
from test_e2e_torch_parity import _fit_params, _install_shims  # noqa: E402
from test_system_parity import _ref_cfg, _ref_run_protocol  # noqa: E402

pytestmark = pytest.mark.slow  # torch reference pipeline + full CLI runs

SMALL = [
    "TEST.SCALES", "(128,)",
    "TEST.RPN_PRE_NMS_TOP_N", "256",
    "TEST.RPN_POST_NMS_TOP_N", "32",
]


def _ref_coco_dataset(tmp_path, *, seen=2, group=1, small=True,
                      training=False, use_flipped=False):
    ref_cfg = _ref_cfg()
    ref_cfg.DATA_DIR = str(tmp_path)
    ref_cfg.TRAIN.USE_FLIPPED = use_flipped
    ref_cfg.TRAIN.SCALES = (128,)
    ref_cfg.TEST.SCALES = (128,)
    if small:
        ref_cfg.TEST.RPN_PRE_NMS_TOP_N = 256
        ref_cfg.TEST.RPN_POST_NMS_TOP_N = 32
    ref_cfg.POOLING_MODE = "align"
    # the coco dispatch (test_net_coco.py:200-205) + cfgs/res50_1.yml group
    ref_cfg.ANCHOR_SCALES = [4, 8, 16, 32]
    ref_cfg.MAX_NUM_GT_BOXES = 50
    ref_cfg.train_categories = [group]
    ref_cfg.test_categories = [group]

    from roi_data_layer.roibatchLoader import roibatchLoader
    from roi_data_layer.roidb import combined_roidb

    imdb, roidb, ratio_list, ratio_index, query = combined_roidb(
        "coco_2017_val", training, seen=seen)
    imdb.competition_mode(on=True)  # no salt, no cleanup of unwritten files
    ds = roibatchLoader(roidb, ratio_list, ratio_index, query, 1,
                        imdb.num_classes, training=training, seen=seen)
    assert imdb.num_classes == 81  # the loader's coco branch requires it
    return imdb, roidb, ds, ratio_index


def _our_cfg():
    from ait_tpu.config import Config
    return Config.from_yaml(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cfgs", "res50_1.yml")).override([
            "ANCHOR_SCALES", "(4, 8, 16, 32)",
            "MAX_NUM_GT_BOXES", "50",
            "tpu.input_uint8", "False",
            "tpu.host_s2d", "False",
            "tpu.compute_dtype", "float32",
            "tpu.image_size", "(128, 160)",
            *SMALL,
        ])


def _our_view(tmp_path, seen=2, group=1):
    from ait_tpu.data import coco as coco_data
    view = coco_data.load_coco(str(tmp_path / "coco"), "2017", "val")
    return coco_data.filter_seen(view, seen, group)


# ---------------------------------------------------------------------------
# 1. Data layer, eval mode: coco pair enumeration + item pixels
# ---------------------------------------------------------------------------

def test_data_layer_eval_parity_coco(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_coco_devkit(str(tmp_path))
    _install_shims()
    imdb, roidb, ref_ds, ratio_index = _ref_coco_dataset(tmp_path)

    from ait_tpu.data import OneShotLoader

    view = _our_view(tmp_path)
    loader = OneShotLoader(view, _our_cfg(), training=False)

    # pair enumeration parity: (img_id, class ind) lists must be identical
    ref_pairs = [(roidb[int(ratio_index[0][i])]["img_id"],
                  int(ratio_index[1][i]))
                 for i in range(len(ratio_index[0]))]
    our_pairs = [(view.records[ri].img_id, ci) for ri, ci in loader.pairs]
    assert ref_pairs == our_pairs and len(ref_pairs) > 0

    for qpos in range(2):
        ref_ds.query_position = qpos
        loader.query_position = qpos
        for pi in range(len(our_pairs)):
            r_img, r_query, r_info, _r_gt, r_choice = ref_ds[pi]
            ours = loader.test_item(pi)
            assert int(r_choice) == int(ours["category"])
            r_info = r_info.numpy().reshape(-1)
            np.testing.assert_allclose(ours["im_info"], r_info, rtol=1e-6)
            h, w = int(r_info[0]), int(r_info[1])
            r_img = r_img.numpy().transpose(1, 2, 0)
            assert r_img.shape[:2] == (h, w)
            canvas = ours["image"]
            np.testing.assert_allclose(canvas[:h, :w], r_img, atol=1e-5)
            assert np.all(canvas[h:] == 0) and np.all(canvas[:, w:] == 0)
            r_query = r_query.numpy().transpose(1, 2, 0)
            np.testing.assert_allclose(ours["query"], r_query, atol=1e-5)


# ---------------------------------------------------------------------------
# 2. Full system: CLI vs reference protocol + evaluator gates
# ---------------------------------------------------------------------------

def _strip_pad_artifact(all_boxes):
    """Drop the reference proposal layer's zero-pad artifact (a ~1 px box at
    the origin surviving as a 0.5-score detection) — tiny-config-only, see
    the VOC system test for the full analysis."""
    for per_cls in all_boxes:
        for i, dets in enumerate(per_cls):
            if len(dets):
                d = np.asarray(dets)
                per_cls[i] = d[~((d[:, 0] < 1e-3) & (d[:, 2] < 2.0)
                                 & (d[:, 3] < 2.0))]


def _soft_match(a, b, iou_thr=0.5, score_atol=2e-2):
    """Tie-tolerant detection-set agreement: greedy best-IoU matching with a
    score band; returns 2*|matches| / (|a| + |b|) (1.0 = identical sets up
    to drift-reordering)."""
    a = np.asarray(a, np.float32).reshape(-1, 5)
    b = np.asarray(b, np.float32).reshape(-1, 5)
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    ax1, ay1, ax2, ay2 = (a[:, i, None] for i in range(4))
    bx1, by1, bx2, by2 = (b[None, :, i] for i in range(4))
    iw = np.clip(np.minimum(ax2, bx2) - np.maximum(ax1, bx1) + 1, 0, None)
    ih = np.clip(np.minimum(ay2, by2) - np.maximum(ay1, by1) + 1, 0, None)
    inter = iw * ih
    area_a = (a[:, 2] - a[:, 0] + 1) * (a[:, 3] - a[:, 1] + 1)
    area_b = (b[:, 2] - b[:, 0] + 1) * (b[:, 3] - b[:, 1] + 1)
    iou = inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                             1e-9)
    ok = (iou >= iou_thr) & (np.abs(a[:, 4, None] - b[None, :, 4])
                             <= score_atol)
    cand = iou * ok
    used = np.zeros(len(b), bool)
    matches = 0
    for i in np.argsort(-a[:, 4]):
        j = int(np.argmax(cand[i] - used * 10.0))
        if cand[i, j] > 0 and not used[j]:
            used[j] = True
            matches += 1
    return 2.0 * matches / (len(a) + len(b))


def test_full_system_eval_parity_coco(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    make_coco_devkit(str(tmp_path))
    _install_shims()
    imdb, roidb, ds, ratio_index = _ref_coco_dataset(tmp_path)
    n_pairs_ref = len(ratio_index[0])
    assert n_pairs_ref > 0

    from model.faster_rcnn.resnet_coatt_transformer_sk import resnet

    torch.manual_seed(3)
    ref_model = resnet(imdb.classes, 50, pretrained=False,
                       class_agnostic=True, num_K=3)
    ref_model.create_architecture()
    ref_model.eval()

    n_shots = 2
    ref_shots = _ref_run_protocol(imdb, ds, ratio_index, ref_model, n_shots)
    for all_boxes in ref_shots:
        _strip_pad_artifact(all_boxes)

    ref_stats = []
    ref_out = tmp_path / "refout"
    os.makedirs(ref_out, exist_ok=True)
    for all_boxes in ref_shots:
        imdb.evaluate_detections(all_boxes, str(ref_out), save_results=False)
        # evaluate_detections returns None; the run's customCOCOeval is
        # pickled to detection_results.pkl (coco.py:332-335) — read .stats
        with open(ref_out / "detection_results.pkl", "rb") as f:
            ref_stats.append(np.array(pickle.load(f).stats, np.float64))

    # ---- our side: same weights -> orbax ckpt -> full CLI on the same tree
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ait_tpu.convert import convert_detector
    from ait_tpu.models import AITDetector
    from ait_tpu.train import (TrainState, init_params, lr_schedule,
                               make_optimizer)
    from ait_tpu.train.checkpoint import CheckpointManager, save_config

    cfg = _our_cfg()
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, backbone="resnet50", coattention="nonlocal",
        channels=1024, class_agnostic=True))
    model = AITDetector(cfg, dtype=jnp.float32)
    template = init_params(model, cfg, jax.random.PRNGKey(0))
    params = _fit_params(template, convert_detector(ref_model.state_dict()))

    run_dir = tmp_path / "models" / "res50" / "coco" / "parity"
    os.makedirs(run_dir, exist_ok=True)
    tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
    mgr = CheckpointManager(str(run_dir / "ckpt"))
    mgr.save(1, TrainState.create(params, tx))
    save_config(str(run_dir), cfg)

    import test_net as cli

    out_dir = str(tmp_path / "output")
    results = cli.main([
        "--dataset", "coco", "--net", "res50", "--g", "1",
        "--data_dir", str(tmp_path), "--seen", "2", "--a", str(n_shots),
        "--bs", "2", "--nw", "0",
        "--checkpoint_path", str(run_dir / "ckpt"),
        "--output_dir", out_dir,
        "--set",
        "tpu.input_uint8", "False",
        "tpu.host_s2d", "False",
        "tpu.compute_dtype", "float32",
        "tpu.image_size", "(128, 160)",
        *SMALL,
    ])
    assert len(results) == n_shots

    view = _our_view(tmp_path)
    img_of_rec = [r.img_id for r in view.records]

    # ---- per-pair detection agreement (tie-tolerant, see module docstring)
    scores = []
    for avg in range(n_shots):
        with open(os.path.join(out_dir, f"sess1_g1_seen2_{avg}.pkl"),
                  "rb") as f:
            ours = pickle.load(f)
        n_pairs_ours = sum(len(v) for v in ours.values())
        assert n_pairs_ours == n_pairs_ref, (
            f"pair enumeration diverges: ours {n_pairs_ours} "
            f"vs ref {n_pairs_ref}")
        ref_boxes = ref_shots[avg]
        for ci, per_rec in ours.items():
            for ri, dets in per_rec.items():
                img_idx = imdb.image_index.index(img_of_rec[ri])
                scores.append(_soft_match(dets, ref_boxes[ci][img_idx]))
    mean_f = float(np.mean(scores))
    print(f"\nsoft det agreement: mean {mean_f:.3f}, "
          f"min {min(scores):.3f}, pairs {len(scores)}")
    assert mean_f >= 0.85, f"detection sets diverge: mean F {mean_f:.3f}"

    # ---- AP parity (reference stats: [AP, AP50, AP75, ...])
    for avg in range(n_shots):
        d50 = abs(results[avg]["AP50"] - ref_stats[avg][1])
        dap = abs(results[avg]["AP"] - ref_stats[avg][0])
        print(f"shot {avg}: AP50 ours {results[avg]['AP50']:.4f} "
              f"ref {ref_stats[avg][1]:.4f}; AP ours "
              f"{results[avg]['AP']:.4f} ref {ref_stats[avg][0]:.4f}")
        assert d50 < 0.02 and dap < 0.02, (
            f"shot {avg}: AP drift beyond tie noise (d50={d50:.3f}, "
            f"dap={dap:.3f})")

    # ---- drift-free cross-EVALUATOR gate: our COCODetEval on the
    # REFERENCE's detections reproduces customCOCOeval's stats exactly
    from ait_tpu.evaluation.coco_eval import (COCODetEval,
                                              dets_to_coco_results)

    gt = view.coco_gt
    rec_of_img = {im: i for i, im in enumerate(img_of_rec)}
    class_index = [c - 1 for c in view.allowed_classes]
    for avg in range(n_shots):
        ref_as_ours = {}
        for ci in view.allowed_classes:
            per = {}
            for img_idx, im_id in enumerate(imdb.image_index):
                dets = ref_shots[avg][ci][img_idx]
                if len(dets):
                    per[rec_of_img[im_id]] = np.asarray(dets)
            ref_as_ours[ci] = per
        dets = dets_to_coco_results(ref_as_ours,
                                    dict(enumerate(img_of_rec)),
                                    gt.class_ind_to_cat_id)
        ev = COCODetEval(gt, dets, img_ids=img_of_rec)
        ev.evaluate()
        ev.accumulate()
        stats = ev.summarize(class_index=class_index)
        np.testing.assert_allclose(
            np.asarray(stats, np.float64)[:2], ref_stats[avg][:2],
            rtol=0, atol=1e-8,
            err_msg=f"shot {avg}: evaluator mismatch")


# ---------------------------------------------------------------------------
# 3. Data layer, train mode: coco branch under forced sampling decisions
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_all_gt,use_flipped",
                         [(True, False), (False, False), (True, True)])
def test_data_layer_train_parity_coco(tmp_path, monkeypatch, use_all_gt,
                                      use_flipped):
    """The coco TRAIN item pipeline vs roibatchLoader under forced draws:
    the hardcoded coco class table -> list_ind gt filter, the
    inverse-frequency table (crowd instances count), binary relabel, query
    crop from the pkl-gated pool, MAX_NUM_GT_BOXES=50 padding, and the
    USE_ALL_GT crowd gate (config.py:160-161, minibatch.py:38-44) in BOTH
    settings — image 3's iscrowd box must appear in the training gt under
    the reference's default True and vanish under False.  The use_flipped
    leg pins append_flipped_images' doubled roidb + mirrored boxes on the
    coco branch (the recipe trains with flips ON)."""
    import random as pyrandom

    monkeypatch.chdir(tmp_path)
    make_coco_devkit(str(tmp_path))
    _install_shims()

    # force the reference's draws: first exemplar, no hflip, identity gt
    # shuffle, first class choice (same forcing as the VOC train test)
    monkeypatch.setattr(pyrandom, "choice", lambda seq: seq[0])
    monkeypatch.setattr(pyrandom, "randint", lambda a, b: 0)
    monkeypatch.setattr(np.random, "shuffle", lambda x: None)
    _orig_choice = np.random.choice
    monkeypatch.setattr(
        np.random, "choice",
        lambda cand, n=1, p=None: np.asarray([cand[0]])
        if p is not None else _orig_choice(cand, n))

    ref_cfg = _ref_cfg()
    ref_cfg.TRAIN.USE_ALL_GT = use_all_gt
    imdb, roidb, ds, ratio_index = _ref_coco_dataset(
        tmp_path, training=True, use_flipped=use_flipped)

    from test_system_parity import _ForcedRng

    from ait_tpu.data import OneShotLoader

    cfg = _our_cfg().override([
        "TRAIN.SCALES", "(128,)",
        "TRAIN.USE_FLIPPED", repr(use_flipped),
        "TRAIN.USE_ALL_GT", repr(use_all_gt),
    ])
    view = _our_view(tmp_path)
    loader = OneShotLoader(view, cfg, training=True)
    loader.rng = _ForcedRng()

    # inverse-frequency table parity (roibatchLoader.probability,
    # :365-383) — deterministic, no forcing involved
    assert set(ds.show_time) == set(loader.freq)
    for ci in ds.show_time:
        np.testing.assert_allclose(loader.freq[ci], ds.show_time[ci],
                                   rtol=1e-12)

    # align items by (img_id, flipped) — with USE_FLIPPED the roidb is
    # doubled and the training ratio_index spans both halves
    our_by_img = {(view.records[i].img_id, bool(view.records[i].flipped)): i
                  for i in range(len(view.records))}
    assert len(our_by_img) == len(ratio_index)
    crowd_seen = 0
    for i in range(len(ratio_index)):
        rec = roidb[int(ratio_index[i])]
        r_img, r_query, r_info, r_gt, r_n = ds[i]
        ours = loader.train_item(
            our_by_img[(rec["img_id"], bool(rec.get("flipped")))])

        r_info = r_info.numpy().reshape(-1)
        h, w = int(ours["im_info"][0]), int(ours["im_info"][1])
        assert abs(int(r_info[0]) - h) <= 1 and abs(int(r_info[1]) - w) <= 1
        np.testing.assert_allclose(ours["im_info"][2], r_info[2], rtol=1e-6)

        r_img = r_img.numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours["image"][:h, :w], r_img[:h, :w],
                                   atol=1e-5)
        r_query = r_query.numpy().transpose(1, 2, 0)
        np.testing.assert_allclose(ours["query"], r_query, atol=1e-5)

        np.testing.assert_array_equal(int(ours["num_boxes"]), int(r_n))
        np.testing.assert_allclose(ours["gt_boxes"], r_gt.numpy(),
                                   atol=1e-4)
        if rec["img_id"] == 3:
            # the crowd gate: 2 gt rows under USE_ALL_GT, 1 without
            assert int(r_n) == (2 if use_all_gt else 1)
            crowd_seen += 1
    assert crowd_seen == (2 if use_flipped else 1)
