"""Official VOC devkit result-file writer (pascal_voc.py:312-328) +
experiment.info comp-id channel (test_net_voc.py:223-225)."""

import os

import numpy as np

from ait_tpu.data.records import ImageRecord
from ait_tpu.evaluation import (comp_id_tag, read_experiment_info,
                                write_experiment_info,
                                write_voc_results_files)


def _rec(name):
    return ImageRecord(img_id=name, image_path=f"/x/JPEGImages/{name}.jpg",
                       width=100, height=100,
                       boxes=np.zeros((0, 4), np.float32),
                       gt_classes=np.zeros((0,), np.int32),
                       difficult=np.zeros((0,), np.int32))


def test_experiment_info_roundtrip(tmp_path):
    tag = comp_id_tag(1, 10, "0.0.0")
    assert tag == "Session-1_Epoch-10_Version-0.0.0"
    p = write_experiment_info(tag, str(tmp_path / "experiment.info"))
    assert read_experiment_info(p) == tag


def test_result_files_one_based_and_sparse(tmp_path):
    records = [_rec("000005"), _rec("000007")]
    classes = ("__background__", "aeroplane", "cat")
    all_boxes = {
        1: {0: np.array([[10.0, 20.0, 30.0, 40.0, 0.9]], np.float32),
            1: np.zeros((0, 5), np.float32)},       # empty image skipped
        2: {1: np.array([[1.0, 2.0, 3.0, 4.0, 0.5],
                         [5.0, 6.0, 7.0, 8.0, 0.25]], np.float32)},
    }
    paths = write_voc_results_files(
        all_boxes, records, classes, str(tmp_path), "2007", "test",
        "Session-1_Epoch-10_Version-0.0.0", use_salt=False)
    assert len(paths) == 2
    assert all("results/VOC2007/Main" in p for p in paths)
    aero = open([p for p in paths if p.endswith("_aeroplane.txt")][0]).read()
    # devkit wants 1-based coords (+1 on write, pascal_voc.py:328)
    assert aero == "000005 0.900 11.0 21.0 31.0 41.0\n"
    cat = open([p for p in paths if p.endswith("_cat.txt")][0]).readlines()
    assert len(cat) == 2 and cat[0].startswith("000007 0.500 2.0 3.0")


def test_salted_comp_id_unique(tmp_path):
    records = [_rec("000001")]
    all_boxes = {1: {0: np.array([[1, 1, 2, 2, 0.5]], np.float32)}}
    p1 = write_voc_results_files(all_boxes, records,
                                 ("__background__", "dog"), str(tmp_path),
                                 "2007", "test", "comp")
    p2 = write_voc_results_files(all_boxes, records,
                                 ("__background__", "dog"), str(tmp_path),
                                 "2007", "test", "comp")
    assert p1[0] != p2[0]  # uuid salt (pascal_voc.py:293-296)
