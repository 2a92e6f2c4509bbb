"""End-to-end CLI integration: tools/test_net.py on a synthetic VOC devkit.

Drives the full evaluation surface in one go — cfg-file resolution +
--set overrides, dataset load + seen-split filter, the one-shot pair
loader, the jitted eval forward + on-device postprocess, the VOC AP
evaluator, the per-shot detection pickle cache, and shot averaging — the
reference's `test_net_voc.py` flow end to end (random init; the AP value
is irrelevant, the plumbing is what's under test).
"""

import pytest
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from fixtures import make_voc_devkit

pytestmark = pytest.mark.slow  # >30s: heavy compile / torch parity


def _argv(tmp_path, out_dir, bs=2, extra_set=()):
    return [
        "--dataset", "pascal_voc", "--net", "res50",
        "--data_dir", str(tmp_path), "--seen", "2", "--a", "2",
        "--bs", str(bs), "--nw", "0", "--debug", "--write_results",
        "--output_dir", out_dir,
        "--save_dir", str(tmp_path / "models"),
        "--set",
        "tpu.image_size", "(128, 160)",
        "tpu.portrait_bucket", "False",
        "TEST.SCALES", "(100,)",
        "TEST.RPN_PRE_NMS_TOP_N", "256",
        "TEST.RPN_POST_NMS_TOP_N", "32",
        *extra_set,
    ]


def test_test_net_cli(tmp_path):
    import test_net as cli

    devkit = make_voc_devkit(str(tmp_path / "VOCdevkit2007"))
    assert os.path.isdir(devkit)

    out_dir = str(tmp_path / "output")
    results = cli.main(_argv(tmp_path, out_dir))

    # one result dict per query-shot pass, mAP over the unseen split
    assert len(results) == 2
    for res in results:
        assert "mAP" in res and np.isfinite(res["mAP"])
    # detection caches written per pass
    pkls = [f for f in os.listdir(out_dir) if f.endswith(".pkl")]
    assert len(pkls) == 2
    with open(os.path.join(out_dir, sorted(pkls)[0]), "rb") as f:
        all_boxes = pickle.load(f)
    assert isinstance(all_boxes, dict) and len(all_boxes) > 0
    # experiment.info comp-id + official devkit result files
    # (pascal_voc.py:75-80,312-328)
    info = os.path.join(out_dir, "experiment.info")
    assert os.path.exists(info)
    assert open(info).read().startswith("Session-")
    main_dir = os.path.join(devkit, "results", "VOC2007", "Main")
    assert os.path.isdir(main_dir)
    res_files = os.listdir(main_dir)
    assert res_files, "no devkit result files written"
    for line in open(os.path.join(main_dir, sorted(res_files)[0])):
        parts = line.split()
        assert len(parts) == 6  # index score x1 y1 x2 y2


def test_test_net_cli_multi_device_matches_single(tmp_path):
    """On the 8-device virtual mesh the eval CLI shards the pair batch
    (--bs 4 -> 4-device mesh) and its detections match a single-device run
    (--bs 1) on every pair both runs evaluated."""
    import test_net as cli

    make_voc_devkit(str(tmp_path / "VOCdevkit2007"))
    out1, out4 = str(tmp_path / "out1"), str(tmp_path / "out4")
    cli.main(_argv(tmp_path, out1, bs=1))
    cli.main(_argv(tmp_path, out4, bs=4))

    def load(out_dir):
        f = sorted(p for p in os.listdir(out_dir) if p.endswith(".pkl"))[0]
        with open(os.path.join(out_dir, f), "rb") as fh:
            return pickle.load(fh)

    b1, b4 = load(out1), load(out4)
    _assert_dets_close(b1, b4, "single-device and sharded eval")


def _assert_dets_close(b1, b4, what, outlier_frac=0.0):
    """Every detection row of b1 must have a close counterpart in b4's same
    record (nearest-row match: score order may swap under a different
    reduction order).  `outlier_frac` rows may fail — with a random-init
    net, ~1e-3 score jitter at an NMS tie swaps which near-duplicate box
    survives, which is amplification, not divergence."""
    total, bad = 0, 0
    for ci in b1:
        for ri in set(b1[ci]) & set(b4.get(ci, {})):
            a, b = np.asarray(b1[ci][ri]), np.asarray(b4[ci][ri])
            # bf16 batching jitter can flip a tie at the valid-count
            # boundary; the surviving rows must agree
            assert abs(len(a) - len(b)) <= 1, (ci, ri, len(a), len(b))
            for row in a:
                total += 1
                if not any(np.allclose(row, brow, rtol=2e-2, atol=2e-2)
                           for brow in b):
                    bad += 1
    assert total >= 4, f"only {total} detections to compare"
    allowed = int(np.ceil(outlier_frac * total))
    assert bad <= allowed, (f"{bad}/{total} rows without a close "
                            f"counterpart between {what}")


def test_test_net_cli_seq_parallel_matches_data_parallel(tmp_path):
    """--set tpu.sp_size 2 builds a ('data','seq') mesh in the eval CLI
    (dp2 x sp2 on the 8-device virtual mesh) and the co-attention's
    image-token sequence shards over 'seq'; detections must match the
    dp-only run at the SAME batch size (identical batching — the only
    delta is the sequence-sharded co-attention arithmetic)."""
    import test_net as cli

    make_voc_devkit(str(tmp_path / "VOCdevkit2007"))
    outdp, outsp = str(tmp_path / "outdp"), str(tmp_path / "outsp")
    res_dp = cli.main(_argv(tmp_path, outdp, bs=2))
    res_sp = cli.main(_argv(tmp_path, outsp, bs=2,
                            extra_set=("tpu.sp_size", "2")))

    def load(out_dir):
        f = sorted(p for p in os.listdir(out_dir) if p.endswith(".pkl"))[0]
        with open(os.path.join(out_dir, f), "rb") as fh:
            return pickle.load(fh)

    # the sp softmax reassociates f32 reductions; through a random-init
    # net + NMS + top-k that flips which near-tie box survives on a few
    # slots (bf16 CLI path; amplification bounds measured in
    # tests/test_sp.py::test_detector_eval_step_on_data_seq_mesh, which
    # pins the numerics tightly at f32 on stable slots) — here assert the
    # WIRING: most detections agree and the per-pass mAPs stay close
    _assert_dets_close(load(outdp), load(outsp),
                       "dp2 and dp2xsp2 eval", outlier_frac=0.4)
    for rd, rs in zip(res_dp, res_sp):
        assert abs(rd["mAP"] - rs["mAP"]) < 8.0, (rd["mAP"], rs["mAP"])


def test_test_net_cli_fused_shots_matches_per_pass(tmp_path):
    """--fuse_shots (one sweep, image backbone amortized across the --a
    shots via train.make_fused_eval_step) vs the per-pass protocol.

    The fused step's bitwise properties are pinned in test_fused_eval.py;
    end-to-end at RANDOM init the tail's different pair-batch size perturbs
    near-tie NMS orderings (documented there), so the CLI gate is
    structural + tie-tolerant: same (class, record) coverage, and most
    detection sets matching under IoU + score-band matching."""
    import test_net as cli
    from test_system_parity_coco import _soft_match

    make_voc_devkit(str(tmp_path / "VOCdevkit2007"))

    out_a = str(tmp_path / "out_separate")
    res_a = cli.main(_argv(tmp_path, out_a))
    out_b = str(tmp_path / "out_fused")
    res_b = cli.main(_argv(tmp_path, out_b) + ["--fuse_shots"])

    assert len(res_a) == len(res_b) == 2
    scores = []
    for avg in range(2):
        with open(os.path.join(out_a, f"sess1_seen2_{avg}.pkl"),
                  "rb") as f:
            boxes_a = pickle.load(f)
        with open(os.path.join(out_b, f"sess1_seen2_{avg}.pkl"),
                  "rb") as f:
            boxes_b = pickle.load(f)
        assert set(boxes_a) == set(boxes_b)
        for ci in boxes_a:
            assert set(boxes_a[ci]) == set(boxes_b[ci]), f"class {ci}"
            for ri in boxes_a[ci]:
                scores.append(_soft_match(boxes_a[ci][ri],
                                          boxes_b[ci][ri],
                                          score_atol=5e-2))
    assert scores and float(np.mean(scores)) >= 0.7, (
        f"fused detections diverge beyond tie noise: "
        f"mean F {np.mean(scores):.3f}")
