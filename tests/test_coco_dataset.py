"""COCO dataset loading: sanitize, crowd, reference-pkl gating, splits."""

import json
import pickle

import numpy as np

from ait_tpu.data.coco import COCOGt, filter_seen, load_coco, split_classes


def write_dataset(root, with_crowd=True):
    data = root / "coco"
    (data / "annotations").mkdir(parents=True)
    img_dir = data / "images" / "train2017"
    img_dir.mkdir(parents=True)
    import imageio.v2 as imageio

    rng = np.random.RandomState(0)
    images, anns = [], []
    for i in range(1, 4):
        imageio.imwrite(str(img_dir / f"{i:012d}.jpg"),
                        (rng.rand(60, 80, 3) * 255).astype(np.uint8))
        images.append({"id": i, "width": 80, "height": 60,
                       "file_name": f"{i:012d}.jpg"})
    anns = [
        # normal box
        {"id": 1, "image_id": 1, "category_id": 1,
         "bbox": [5, 5, 30, 20], "area": 600, "iscrowd": 0},
        # overflowing box -> sanitized to the image
        {"id": 2, "image_id": 1, "category_id": 3,
         "bbox": [70, 50, 30, 30], "area": 900, "iscrowd": 0},
        # zero-area -> dropped
        {"id": 3, "image_id": 2, "category_id": 1,
         "bbox": [10, 10, 5, 5], "area": 0, "iscrowd": 0},
        # crowd -> kept in records, excluded from the query pool
        {"id": 4, "image_id": 2, "category_id": 5,
         "bbox": [2, 2, 40, 30], "area": 1200, "iscrowd": 1},
        {"id": 5, "image_id": 3, "category_id": 7,
         "bbox": [8, 6, 25, 25], "area": 625, "iscrowd": 0},
    ]
    doc = {"images": images, "annotations": anns,
           "categories": [{"id": c, "name": f"c{c}"}
                          for c in (1, 3, 5, 7)]}
    (data / "annotations" / "instances_train2017.json").write_text(
        json.dumps(doc))
    return data


def test_load_sanitize_and_crowd(tmp_path):
    data = write_dataset(tmp_path)
    view = load_coco(str(data), "2017", "train")
    assert len(view.records) == 3
    r1 = view.records[0]
    # sanitize: x2 = min(w-1, x1 + bw - 1)
    np.testing.assert_allclose(r1.boxes[1], [70, 50, 79, 59])
    # zero-area dropped; crowd kept with flag
    r2 = view.records[1]
    assert len(r2.boxes) == 1
    assert r2.difficult[0] == 1  # iscrowd rides `difficult`
    # crowd not in the query pool; normal boxes are
    assert len(view.cat_data[3]) == 0  # class ind 3 == cat id 5 (crowd)
    assert len(view.cat_data[1]) == 1
    # raw gt kept on the view for evaluation
    assert isinstance(view.coco_gt, COCOGt)
    assert len(view.coco_gt.annotations) == 5


def test_reference_pkl_gating(tmp_path):
    data = write_dataset(tmp_path)
    # reference pickle allows only annotation idx 0 of image 1
    ref = {1: {0: "something"}}
    ref_file = tmp_path / "ref.pkl"
    ref_file.write_bytes(pickle.dumps(ref))
    view = load_coco(str(data), "2017", "train",
                     reference_file=str(ref_file))
    # image 1: only its first ann enters the pool; images 2/3 absent from
    # the reference dict -> nothing eligible
    assert len(view.cat_data[1]) == 1
    assert len(view.cat_data[4]) == 0  # class of cat id 7


def test_group_splits(tmp_path):
    # contiguous class inds 1..80: seen=1/g=2 keeps c%4 != 2
    s = split_classes(1, 2)
    assert 2 not in s and 6 not in s and 1 in s and 80 in s
    u = split_classes(2, 2)
    assert set(u) == {c for c in range(1, 81) if c % 4 == 2}
    assert set(s) | set(u) == set(range(1, 81))

    data = write_dataset(tmp_path)
    view = load_coco(str(data), "2017", "train")
    # 4 classes -> split by ind % 4
    v = filter_seen(view, seen=2, group=1)
    assert v.allowed_classes == [1]  # ind 1 of 4


def test_record_cache_roundtrip(tmp_path):
    """cache_dir: second load skips the json parse (reference pickles its
    roidb, coco.py:91-99); coco_gt still reachable lazily for eval."""
    data = write_dataset(tmp_path)
    cache = tmp_path / "cache"
    v1 = load_coco(str(data), "2017", "train", cache_dir=str(cache))
    assert (cache / "coco_2017_train_records.pkl").exists()
    v2 = load_coco(str(data), "2017", "train", cache_dir=str(cache))
    assert v2._coco_gt is None          # not built on cache hit...
    assert len(v2.records) == len(v1.records)
    assert v2.classes == v1.classes
    for r1, r2 in zip(v1.records, v2.records):
        np.testing.assert_array_equal(r1.boxes, r2.boxes)
        np.testing.assert_array_equal(r1.gt_classes, r2.gt_classes)
    assert {k: len(v) for k, v in v1.cat_data.items()} == \
        {k: len(v) for k, v in v2.cat_data.items()}
    # ...but available on demand
    assert isinstance(v2.coco_gt, COCOGt)
    assert len(v2.coco_gt.annotations) == len(v1.coco_gt.annotations)
