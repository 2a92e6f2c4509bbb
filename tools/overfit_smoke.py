#!/usr/bin/env python
"""End-to-end trainability check: overfit a tiny synthetic shapes dataset.

Generates images of colored shapes (class = color x shape), trains the real
pipeline (OneShotLoader -> donated-jit train step, reference hyperparams)
for a few hundred steps, then evaluates one-shot AP on the same set.  A
working training path drives the loss down sharply and pushes mAP far above
chance; run on TPU (a few minutes) or CPU with --steps 30 (slow).

Usage: python tools/overfit_smoke.py [--steps 300] [--bs 8] [--lr 0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("AIT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["AIT_PLATFORM"])

# hardware RNG for dropout/sampling keys: threefry mask generation
# profiled at ~7 ms/train-step; rbg lowers to the TPU RngBitGenerator
jax.config.update("jax_default_prng_impl", "rbg")

import imageio.v2 as imageio
import jax.numpy as jnp
import numpy as np

from ait_tpu.config import Config
from ait_tpu.data import (DatasetView, ImageRecord, OneShotLoader,
                          QueryExemplar, device_prefetch)
from ait_tpu.evaluation import evaluate_voc, postprocess_detections
from ait_tpu.models import AITDetector
from ait_tpu.train import (TrainState, init_params, lr_schedule,
                           make_eval_step, make_optimizer, make_train_step)
from ait_tpu.utils import printer

COLORS = [(220, 40, 40), (40, 200, 40), (60, 60, 230), (230, 220, 40)]
SHAPES = ["rect", "disc"]
CLASSES = ["__background__"] + [f"{s}{ci}" for ci in range(len(COLORS))
                                for s in SHAPES]


def make_dataset(root, n_images=24, seed=0):
    import cv2

    rng = np.random.RandomState(seed)
    records, cat_data = [], {i: [] for i in range(len(CLASSES))}
    for idx in range(n_images):
        h = w = 400
        im = rng.randint(90, 150, (h, w, 3)).astype(np.uint8)
        boxes, cls = [], []
        for _ in range(rng.randint(2, 4)):
            c = rng.randint(1, len(CLASSES))
            color = COLORS[(c - 1) // len(SHAPES)]
            shape = SHAPES[(c - 1) % len(SHAPES)]
            size = rng.randint(70, 140)
            x1 = rng.randint(0, w - size)
            y1 = rng.randint(0, h - size)
            if shape == "rect":
                cv2.rectangle(im, (x1, y1), (x1 + size, y1 + size), color,
                              -1)
            else:
                r = size // 2
                cv2.circle(im, (x1 + r, y1 + r), r, color, -1)
            boxes.append([x1, y1, x1 + size - 1, y1 + size - 1])
            cls.append(c)
        path = os.path.join(root, f"im{idx:03d}.jpg")
        imageio.imwrite(path, im)
        rec = ImageRecord(idx, path, w, h, np.asarray(boxes, np.float32),
                          np.asarray(cls, np.int32),
                          np.zeros(len(cls), np.int32))
        records.append(rec)
        for b, c in zip(boxes, cls):
            cat_data[c].append(QueryExemplar(path, np.asarray(b, float)))
    view = DatasetView("shapes", tuple(CLASSES), records, cat_data)
    view.allowed_classes = list(range(1, len(CLASSES)))
    return view


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--eval_bs", type=int, default=8)
    p.add_argument("--coatt", default="mha", choices=["mha", "nonlocal"],
                   help="co-attention flavor (mha=VOC model, "
                        "nonlocal=COCO model)")
    p.add_argument("--no_dec_prefix", action="store_true",
                   help="disable the default-on tpu.dec_prefix_per_image "
                        "(restores reference-exact iid per-proposal "
                        "decoder dropout masks)")
    args = p.parse_args(argv)

    root = tempfile.mkdtemp(prefix="shapes_")
    import dataclasses
    cfg = Config()
    cfg = cfg.replace(model=dataclasses.replace(cfg.model,
                                                coattention=args.coatt))
    if args.no_dec_prefix:
        cfg = cfg.replace(tpu=dataclasses.replace(
            cfg.tpu, dec_prefix_per_image=False))
    view = make_dataset(root)
    view_eval = make_dataset(root)  # same images, fresh (unaugmented) view
    view_eval.allowed_classes = view.allowed_classes

    loader = OneShotLoader(view, cfg, training=True, seed=0)
    printer(f"{len(loader)} training records (with flips)")

    model = AITDetector(cfg, dtype=jnp.bfloat16)
    params = init_params(model, cfg, jax.random.PRNGKey(3))
    tx = make_optimizer(cfg, lr_schedule(args.lr, 100, 1000, 0.1))
    state = jax.device_put(TrainState.create(params, tx), jax.devices()[0])
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    rng = jax.random.PRNGKey(0)

    t0 = time.time()
    it = 0
    first_loss = None
    while it < args.steps:
        for batch in device_prefetch(
                loader.train_epoch(args.bs, num_workers=8)):
            state, metrics = step(state, batch, rng)
            it += 1
            if it == 1 or it % 25 == 0:
                m = jax.device_get(metrics)
                if first_loss is None:
                    first_loss = float(m["loss"])
                printer(f"step {it:4d} ",
                        f"loss {float(m['loss']):.3f} "
                        f"(rpn {float(m['rpn_cls']):.3f}/"
                        f"{float(m['rpn_box']):.3f} "
                        f"rcnn {float(m['rcnn_cls']):.3f} "
                        f"margin {float(m['margin']):.3f} "
                        f"box {float(m['rcnn_box']):.3f})")
            if it >= args.steps:
                break
    final_loss = float(jax.device_get(metrics)["loss"])
    printer(f"trained {it} steps in {time.time() - t0:.0f}s; loss "
            f"{first_loss:.3f} -> {final_loss:.3f}")

    eval_loader = OneShotLoader(view_eval, cfg, training=False)
    eval_step = jax.jit(make_eval_step(model))
    post = jax.jit(lambda r, c, b, ii: postprocess_detections(
        r, c, b, ii, nms_thresh=cfg.TEST.NMS))
    eval_params = jax.device_get(state.params)
    all_boxes = {ci: {} for ci in view_eval.allowed_classes}
    done = set()
    for batch in eval_loader.test_epoch(args.eval_bs, num_workers=8):
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if k in ("image", "query", "im_info", "gt_boxes",
                        "num_boxes")}
        out = eval_step(eval_params, dev)
        dets, valid = post(out["rois"], out["cls_prob"], out["bbox_pred"],
                           jnp.asarray(batch["im_info"]))
        dets, valid = np.asarray(dets), np.asarray(valid)
        for i in range(len(batch["pair_index"])):
            pi = int(batch["pair_index"][i])
            if pi in done:
                continue
            done.add(pi)
            all_boxes[int(batch["category"][i])][
                int(batch["record_index"][i])] = dets[i][valid[i]]
    res = evaluate_voc(all_boxes, view_eval.records,
                       view_eval.allowed_classes, CLASSES[1:])
    printer("per-class AP: ",
            "  ".join(f"{k}={v * 100:.0f}" for k, v in res.items()))
    printer(f"RESULT: loss {first_loss:.3f} -> {final_loss:.3f}, "
            f"train-set mAP = {res['mAP'] * 100:.1f}")
    return res["mAP"]


if __name__ == "__main__":
    main()
