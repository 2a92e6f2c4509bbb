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
