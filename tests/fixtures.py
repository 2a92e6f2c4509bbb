"""Synthetic dataset fixtures shared by tests and CLI smoke drives."""

import os
import xml.etree.ElementTree as ET

import imageio.v2 as imageio
import numpy as np

# images: (name, W, H, [(class, x1, y1, x2, y2, difficult)]) 1-based VOC boxes
VOC_FIXTURE = [
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


def write_voc_xml(path, name, w, h, objs):
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


def make_voc_devkit(root, year="2007", image_set="test", fixture=None,
                    seed=7):
    """Create a synthetic VOCdevkit tree; returns the devkit path."""
    fixture = fixture or VOC_FIXTURE
    base = os.path.join(root, f"VOC{year}")
    for sub in ("Annotations", "JPEGImages", os.path.join("ImageSets",
                                                          "Main")):
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    rng = np.random.RandomState(seed)
    names = []
    for name, w, h, objs in fixture:
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(base, "JPEGImages", f"{name}.jpg"), img)
        write_voc_xml(os.path.join(base, "Annotations", f"{name}.xml"),
                      name, w, h, objs)
        names.append(name)
    with open(os.path.join(base, "ImageSets", "Main",
                           f"{image_set}.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return root


# The 80 live COCO category ids (1..90 with gaps).  The reference HARDCODES
# this table in its loader (roibatchLoader.py:73-82) and keys the coco branch
# off num_classes == 81, so cross-framework fixtures must use the real ids.
COCO_CAT_IDS = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13,
    14, 15, 16, 17, 18, 19, 20, 21, 22, 23,
    24, 25, 27, 28, 31, 32, 33, 34, 35, 36,
    37, 38, 39, 40, 41, 42, 43, 44, 46, 47,
    48, 49, 50, 51, 52, 53, 54, 55, 56, 57,
    58, 59, 60, 61, 62, 63, 64, 65, 67, 70,
    72, 73, 74, 75, 76, 77, 78, 79, 80, 81,
    82, 84, 85, 86, 87, 88, 89, 90,
]

# (img_id, [(cat_id, x1, y1, x2, y2)]) — all 160x128, xyxy inclusive.
# Group-1 split (cfgs/res50_1.yml: test_categories [1] -> class inds
# 1,5,9,13,... -> cat ids 1,5,9,14,...): every image holds >=1 unseen-class
# box so the reference's imdb.filter(seen=2) keeps them; 2/3 also mix in
# seen-class boxes (cat 2, 3) like real COCO images do.
COCO_SYS_FIXTURE = [
    (1, [(1, 16, 16, 96, 112), (2, 48, 32, 144, 120)]),
    (2, [(5, 7, 7, 67, 85), (5, 80, 14, 147, 114)]),
    # image 3 carries an iscrowd box (6th field) of a class that appears
    # nowhere else in the image — pins crowd behavior through the pair
    # enumeration (prepare_roidb argmaxes the -1 overlap row to class 0, so
    # a crowd-only class creates NO eval pair), the USE_ALL_GT gt gate, and
    # the inverse-frequency table (crowd instances DO count)
    (3, [(9, 21, 17, 124, 105), (22, 40, 60, 130, 118, 1)]),
    (4, [(1, 13, 10, 88, 84), (14, 64, 15, 152, 121)]),
    (5, [(3, 22, 14, 128, 105), (5, 32, 27, 96, 116)]),
    (6, [(14, 30, 22, 140, 110)]),
]


def make_coco_devkit(root, image_set="val", year="2017", fixture=None,
                     seed=13):
    """Full synthetic COCO tree for CROSS-FRAMEWORK runs: 80 real category
    ids (the reference requires num_classes == 81 and its hardcoded cat-id
    table), instances json, images, and the Mask-R-CNN reference pickle
    the reference imdb demands at construction (lib/datasets/coco.py:92-99;
    keys = image id -> {annotation position: anything} gate the query pool).
    Returns the `root` dir (= cfg.DATA_DIR holding coco/ and
    coco_reference_image/)."""
    import json
    import pickle

    fixture = list(fixture or COCO_SYS_FIXTURE)
    # roibatchLoader.probability() computes 1/count over EVERY unseen-group
    # class (roibatchLoader.py:368-378), so each must appear in >=1 image:
    # append coverage images (4 quadrant boxes each) for missing ones
    unseen = [COCO_CAT_IDS[i] for i in range(0, 80, 4)]  # class ind %4 == 1
    have = {c for _, objs in fixture for c, *_ in objs}
    missing = [c for c in unseen if c not in have]
    quads = [(10, 10, 70, 60), (85, 10, 150, 60),
             (10, 68, 70, 118), (85, 68, 150, 118)]
    next_id = max(i for i, _ in fixture) + 1
    for start in range(0, len(missing), 4):
        chunk = missing[start:start + 4]
        fixture.append((next_id, [(c,) + quads[j]
                                  for j, c in enumerate(chunk)]))
        next_id += 1

    data = os.path.join(root, "coco")
    data_name = image_set + year
    img_dir = os.path.join(data, "images", data_name)
    ann_dir = os.path.join(data, "annotations")
    ref_dir = os.path.join(root, "coco_reference_image")
    for d in (img_dir, ann_dir, ref_dir):
        os.makedirs(d, exist_ok=True)

    rng = np.random.RandomState(seed)
    w, h = 160, 128
    images, anns, ref_pkl = [], [], {}
    aid = 1
    for img_id, objs in fixture:
        fn = f"{img_id:012d}.jpg"
        imageio.imwrite(os.path.join(img_dir, fn),
                        (rng.rand(h, w, 3) * 255).astype(np.uint8))
        images.append({"id": img_id, "width": w, "height": h,
                       "file_name": fn})
        ref_pkl[img_id] = {i: {} for i in range(len(objs))}
        for obj in objs:
            cat, x1, y1, x2, y2 = obj[:5]
            crowd = obj[5] if len(obj) > 5 else 0
            bw, bh = float(x2 - x1 + 1), float(y2 - y1 + 1)
            anns.append({"id": aid, "image_id": img_id, "category_id": cat,
                         "bbox": [float(x1), float(y1), bw, bh],
                         "area": bw * bh, "iscrowd": int(crowd)})
            aid += 1
    doc = {"images": images, "annotations": anns,
           "categories": [{"id": c, "name": f"c{c}"} for c in COCO_CAT_IDS]}
    with open(os.path.join(ann_dir, f"instances_{data_name}.json"),
              "w") as f:
        json.dump(doc, f)
    with open(os.path.join(
            ref_dir, f"coco_{data_name}_e2e_mask_rcnn_R_101_FPN_1x_"
                     f"caffe2.pkl"), "wb") as f:
        pickle.dump(ref_pkl, f, pickle.HIGHEST_PROTOCOL)
    return root


def make_coco_dataset(root, year="2017", image_set="train", n_images=6,
                      seed=11):
    """Create a synthetic coco tree under root/coco; returns root/coco."""
    import json

    data = os.path.join(root, "coco")
    img_dir = os.path.join(data, "images", image_set + year)
    ann_dir = os.path.join(data, "annotations")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    cat_ids = [1, 2, 3, 5, 7, 9, 11, 13]
    images, anns = [], []
    aid = 1
    for img_id in range(1, n_images + 1):
        w, h = int(rng.randint(100, 160)), int(rng.randint(80, 130))
        fn = f"{img_id:012d}.jpg"
        imageio.imwrite(os.path.join(img_dir, fn),
                        (rng.rand(h, w, 3) * 255).astype(np.uint8))
        images.append({"id": img_id, "width": w, "height": h,
                       "file_name": fn})
        for _ in range(rng.randint(1, 4)):
            cat = int(rng.choice(cat_ids))
            bw = float(rng.uniform(15, w * 0.6))
            bh = float(rng.uniform(15, h * 0.6))
            x = float(rng.uniform(0, w - bw))
            y = float(rng.uniform(0, h - bh))
            anns.append({"id": aid, "image_id": img_id,
                         "category_id": cat, "bbox": [x, y, bw, bh],
                         "area": bw * bh, "iscrowd": 0})
            aid += 1
    doc = {"images": images, "annotations": anns,
           "categories": [{"id": c, "name": f"class{c}"} for c in cat_ids]}
    with open(os.path.join(ann_dir,
                           f"instances_{image_set}{year}.json"), "w") as f:
        json.dump(doc, f)
    return data
