"""VOC data layer + evaluation tests on a synthetic VOCdevkit tree.

The AP test is a golden test: our file-free evaluator must match the
reference's own voc_eval (imported from /root/reference/lib, driven through
its result-file format) on random detections.
"""

import os
import sys
import xml.etree.ElementTree as ET

import imageio.v2 as imageio
import numpy as np
import pytest

from ait_tpu.config import Config
from ait_tpu.data import OneShotLoader
from ait_tpu.data.voc import (UNSEEN_ORDER, VOC_CLASSES, class_order,
                              filter_seen, load_voc, split_classes)
from ait_tpu.evaluation import evaluate_voc

C2I = {c: i for i, c in enumerate(VOC_CLASSES)}

# images: (name, W, H, [(class, x1, y1, x2, y2, difficult)]) 1-based VOC boxes
FIXTURE = [
    ("000001", 100, 80, [("cat", 10, 10, 60, 70, 0),
                         ("dog", 30, 20, 90, 75, 0)]),
    ("000002", 120, 90, [("cow", 5, 5, 50, 60, 0),
                         ("cow", 60, 10, 110, 80, 0),
                         ("car", 20, 30, 70, 85, 1)]),
    ("000003", 90, 110, [("sheep", 12, 15, 70, 90, 0)]),
    ("000004", 100, 100, [("dog", 8, 8, 55, 66, 0),
                          ("person", 40, 12, 95, 95, 0)]),
    ("000005", 110, 85, [("aeroplane", 15, 9, 88, 70, 0),
                         ("cat", 22, 18, 66, 77, 0)]),
]


def _write_xml(path, name, w, h, objs):
    root = ET.Element("annotation")
    size = ET.SubElement(root, "size")
    for tag, val in (("width", w), ("height", h), ("depth", 3)):
        ET.SubElement(size, tag).text = str(val)
    for cls, x1, y1, x2, y2, diff in objs:
        obj = ET.SubElement(root, "object")
        ET.SubElement(obj, "name").text = cls
        ET.SubElement(obj, "pose").text = "Unspecified"
        ET.SubElement(obj, "truncated").text = "0"
        ET.SubElement(obj, "difficult").text = str(diff)
        bb = ET.SubElement(obj, "bndbox")
        for tag, val in (("xmin", x1), ("ymin", y1),
                         ("xmax", x2), ("ymax", y2)):
            ET.SubElement(bb, tag).text = str(val)
    ET.ElementTree(root).write(path)


@pytest.fixture(scope="module")
def devkit(tmp_path_factory):
    root = tmp_path_factory.mktemp("VOCdevkit2007")
    base = root / "VOC2007"
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        (base / sub).mkdir(parents=True)
    rng = np.random.RandomState(7)
    names = []
    for name, w, h, objs in FIXTURE:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        imageio.imwrite(str(base / "JPEGImages" / f"{name}.jpg"), img)
        _write_xml(str(base / "Annotations" / f"{name}.xml"), name, w, h,
                   objs)
        names.append(name)
    with open(base / "ImageSets" / "Main" / "test.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    return str(root)


def test_load_and_parse(devkit):
    view = load_voc(devkit, "2007", "test")
    assert len(view.records) == 5
    r0 = view.records[0]
    assert (r0.width, r0.height) == (100, 80)
    # 0-based conversion: x2 = xmax - 1
    np.testing.assert_allclose(r0.boxes[0], [10, 10, 59, 69])
    assert r0.gt_classes[0] == C2I["cat"]
    # every annotated box lands in the query pool
    assert len(view.cat_data[C2I["cow"]]) == 2
    assert len(view.cat_data[C2I["dog"]]) == 2


def test_filter_seen(devkit):
    view = filter_seen(load_voc(devkit, "2007", "test"), seen=2)
    # unseen = {cow, sheep, cat, aeroplane}: images 1,2,3,5 qualify
    assert len(view.records) == 4
    assert set(view.allowed_classes) == {C2I[c] for c in UNSEEN_ORDER}


def test_train_loader_batch(devkit):
    cfg = Config()
    cfg = cfg.replace(tpu=cfg.tpu)
    view = filter_seen(load_voc(devkit, "2007", "test"), seen=1)
    loader = OneShotLoader(view, cfg, training=True, seed=0)
    batch = next(loader.train_epoch(4, num_workers=2))
    h, w = cfg.tpu.image_size
    if cfg.tpu.host_s2d:  # loader ships the resnet-stem s2d layout
        assert batch["image"].shape == (4, h // 2, w // 2, 12)
    else:
        assert batch["image"].shape == (4, h, w, 3)
    assert batch["query"].shape == (4, 128, 128, 3)
    assert batch["gt_boxes"].shape == (4, cfg.MAX_NUM_GT_BOXES, 5)
    assert batch["im_info"].shape == (4, 3)
    for i in range(4):
        n = int(batch["num_boxes"][i])
        assert n >= 1
        labels = batch["gt_boxes"][i, :n, 4]
        assert set(np.unique(labels)) <= {0.0, 1.0}
        assert labels.max() == 1.0  # the chosen class is present
        # boxes inside the true extent
        ih, iw = batch["im_info"][i, 0], batch["im_info"][i, 1]
        assert batch["gt_boxes"][i, :n, 2].max() <= iw + 1e-3
        assert batch["gt_boxes"][i, :n, 3].max() <= ih + 1e-3


def test_test_loader_deterministic_shots(devkit):
    cfg = Config()
    view = filter_seen(load_voc(devkit, "2007", "test"), seen=2)
    loader = OneShotLoader(view, cfg, training=False)
    # pairs: one per (image, present allowed class)
    assert len(loader.pairs) == 5  # cat, 2xcow->1, sheep, aeroplane, cat
    i0 = loader.test_item(0)
    i0b = loader.test_item(0)
    np.testing.assert_array_equal(i0["query"], i0b["query"])  # deterministic
    loader.query_position = 1
    i0c = loader.test_item(1)  # cow image: pool has 2 shots
    loader.query_position = 0
    i0d = loader.test_item(1)
    assert not np.array_equal(i0c["query"], i0d["query"])


def test_voc_eval_matches_reference(devkit, tmp_path):
    view = load_voc(devkit, "2007", "test")
    rng = np.random.RandomState(3)
    class_inds = split_classes(2)
    names = class_order(2)

    # random detections per (class, image) in 0-based coords
    all_boxes = {ci: {} for ci in class_inds}
    for ci in class_inds:
        for idx, rec in enumerate(view.records):
            n = rng.randint(0, 4)
            dets = np.zeros((n, 5), np.float32)
            for k in range(n):
                x1 = rng.uniform(0, rec.width - 20)
                y1 = rng.uniform(0, rec.height - 20)
                dets[k] = [x1, y1, x1 + rng.uniform(10, 60),
                           y1 + rng.uniform(10, 60), rng.rand()]
            # sometimes inject a near-gt detection
            for bi, c in enumerate(rec.gt_classes):
                if c == ci and rng.rand() < 0.7:
                    b = rec.boxes[bi]
                    hit = np.array([[b[0] + 1, b[1] - 1, b[2] + 2, b[3],
                                     rng.rand()]], np.float32)
                    dets = np.concatenate([dets, hit])
            all_boxes[ci][idx] = dets

    ours = evaluate_voc(all_boxes, view.records, class_inds, names)

    # reference evaluator over result files
    sys.path.insert(0, "/root/reference/lib")
    from datasets.voc_eval import voc_eval as ref_voc_eval  # noqa: E402

    detdir = tmp_path / "dets"
    detdir.mkdir()
    imageset = os.path.join(devkit, "VOC2007", "ImageSets", "Main",
                            "test.txt")
    annopath = os.path.join(devkit, "VOC2007", "Annotations", "{:s}.xml")
    for ci, cname in zip(class_inds, names):
        detfile = detdir / f"det_{cname}.txt"
        with open(detfile, "w") as f:
            for idx, rec in enumerate(view.records):
                name = FIXTURE[idx][0]
                for d in all_boxes[ci][idx]:
                    # the reference writes 1-based coords
                    f.write(f"{name} {d[4]:.6f} {d[0] + 1:.1f} "
                            f"{d[1] + 1:.1f} {d[2] + 1:.1f} {d[3] + 1:.1f}\n")
        _, _, ref_ap = ref_voc_eval(
            str(detdir / "det_{:s}.txt"), annopath, imageset, cname,
            str(tmp_path / f"cache_{cname}"), ovthresh=0.5,
            use_07_metric=True)
        assert abs(ours[cname] - ref_ap) < 1e-8, cname


def test_shot_order_matches_global_seed_sequence():
    """The thread-safe local Random(img_id) shuffle must produce the exact
    sequence of the reference's `random.seed(img_id); random.shuffle`
    (roibatchLoader.py:299-307) — the seed-by-img-id eval determinism
    contract.  (A global-module seed would be timing-dependent under the
    loader's thread pool; the local generator is the fix.)"""
    import random

    from ait_tpu.data.loader import _shot_order

    for img_id in (0, 1, 7, 123456, 2**31 - 1):
        for n in (1, 2, 5, 30):
            want = list(range(n))
            random.seed(img_id)
            random.shuffle(want)
            assert _shot_order(img_id, n) == want, (img_id, n)
