#!/usr/bin/env python
"""Convert reference torch checkpoints to flax param pickles.

Handles both released-artifact formats (SURVEY.md §5):
  * backbone pretrains: {'state_dict': {'module.conv1.weight': ...}}
    (data/pretrain_imagenet_resnet{50,101}/model_best.pth.tar);
  * full detector checkpoints: {'session', 'epoch', 'model': state_dict,
    'optimizer', 'pooling_mode', 'class_agnostic'}
    ({dataset}_{net}_fasterRCNN_*.pth).

Output: a pickle of a nested-dict params tree loadable by
tools/trainval_net.py --pretrained (overlaid onto fresh init, so partial
trees — e.g. backbone-only — are fine).

Usage:
  python tools/convert_torch_checkpoint.py --input model_best.pth.tar \
      --output res50_backbone.pkl
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import torch

from ait_tpu.convert import (convert_backbone, convert_detector,
                             convert_vgg_backbone)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--kind",
                   choices=["auto", "backbone", "vgg_backbone", "detector"],
                   default="auto")
    args = p.parse_args(argv)

    blob = torch.load(args.input, map_location="cpu", weights_only=False)
    kind = args.kind
    if kind == "auto":
        if isinstance(blob, dict) and "model" in blob:
            kind = "detector"
        else:
            kind = "backbone"
    sd = blob.get("model") if kind == "detector" else \
        blob.get("state_dict", blob)
    sd = {k: v for k, v in sd.items()}
    if kind == "backbone" and any(
            k.split("module.")[-1].startswith("features.") for k in sd):
        kind = "vgg_backbone"   # torchvision/caffe vgg16 layout

    tree = {"detector": convert_detector,
            "backbone": convert_backbone,
            "vgg_backbone": convert_vgg_backbone}[kind](sd)

    def count(t):
        return sum(count(v) if isinstance(v, dict) else 1
                   for v in t.values())

    tree = {k: v for k, v in tree.items()}
    with open(args.output, "wb") as f:
        pickle.dump(tree, f, pickle.HIGHEST_PROTOCOL)
    print(f"converted {kind} checkpoint: {count(tree)} arrays -> "
          f"{args.output}")


if __name__ == "__main__":
    main()
