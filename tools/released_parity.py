#!/usr/bin/env python
"""The day-1 real-data play as ONE command: released .pth -> converter ->
eval CLI -> comparison against the paper's numbers.

When the datasets and the released checkpoints become reachable, this is
the whole north-star run (NEXT.md #1):

  python tools/released_parity.py --dataset pascal_voc \
      --pth voc_res50_fasterRCNN_session-1_epoch-10_step-3514.pth \
      --data_dir /data
  python tools/released_parity.py --dataset coco --g 1 \
      --pth coco_res50_fasterRCNN_*.pth --data_dir /data

It checks the on-disk layout first (actionable messages instead of a deep
stack trace), converts the torch checkpoint
(tools/convert_torch_checkpoint.py), runs the reference eval protocol
(tools/test_net.py --seen 2 --a 4, the shot-averaged AP of test_voc.sh /
test_coco.sh), and prints the result against the published baselines
(VOC AP50 72.2 / COCO AP50 24.3, /root/reference/README.md:10;
BASELINE.md).  Exit code 0 iff the measured AP is within --tolerance of
the target (or --no-gate).

Smoke-tested end-to-end on the synthetic devkit + a synthetic
released-format .pth by tests/test_released_parity.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PUBLISHED = {"pascal_voc": 72.2, "coco": 24.3}  # AP50, README.md:10


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="released-.pth AP parity runbook (one command)")
    p.add_argument("--dataset", choices=["pascal_voc", "voc_0712", "coco"],
                   required=True)
    p.add_argument("--pth", required=True,
                   help="released detector checkpoint "
                        "({dataset}_{net}_fasterRCNN_*.pth)")
    p.add_argument("--data_dir", required=True,
                   help="directory holding VOCdevkit2007 (+2012) or coco/")
    p.add_argument("--net", default="res50",
                   choices=["res50", "res101", "vgg16"])
    p.add_argument("--g", dest="group", type=int, default=0,
                   help="COCO class-group split (1-4)")
    p.add_argument("--seen", type=int, default=2,
                   help="2 = unseen classes (the paper protocol)")
    p.add_argument("--a", dest="average", type=int, default=4,
                   help="query shots to average (test_voc.sh: 4)")
    p.add_argument("--bs", dest="batch_size", type=int, default=8)
    p.add_argument("--nw", dest="num_workers", type=int, default=8)
    p.add_argument("--fuse_shots", action="store_true",
                   help="amortize the image backbone across shots")
    p.add_argument("--expected", type=float, default=None,
                   help="target AP50 in percent (default: the published "
                        "number for --dataset)")
    p.add_argument("--tolerance", type=float, default=0.5,
                   help="accepted AP50 shortfall in points")
    p.add_argument("--no-gate", action="store_true",
                   help="report only; always exit 0")
    p.add_argument("--out_dir", default="released_parity_out")
    p.add_argument("--set", dest="set_cfgs", nargs="*",
                   default=[], help="dotted-key config overrides, passed "
                                    "through to test_net.py (same "
                                    "convention as the other CLIs)")
    return p.parse_args(argv)


def _fail(msg: str) -> "NoReturn":
    print(f"[released_parity] FAIL: {msg}", file=sys.stderr)
    raise SystemExit(2)


def check_layout(args) -> None:
    """Actionable path checks BEFORE any compute (the 'download-path
    checks' leg): the exact trees the data layer will open."""
    if not os.path.exists(args.pth):
        _fail(f"checkpoint not found: {args.pth}")
    if args.dataset == "coco":
        base = os.path.join(args.data_dir, "coco")
        need = [os.path.join(base, "annotations"),
                os.path.join(base, "images"),
                os.path.join(args.data_dir, "coco_reference_image")]
        for d in need:
            if not os.path.isdir(d):
                _fail(f"missing {d} (COCO layout: coco/annotations, "
                      f"coco/images/<split><year>, and the Mask-R-CNN "
                      f"reference pickles under coco_reference_image/ — "
                      f"see /root/reference/README.md §4)")
        if args.group not in (1, 2, 3, 4):
            _fail("--g 1..4 required for coco (the 4-way class-group "
                  "split, cfgs/res50_{g}.yml)")
    else:
        devkits = ["VOCdevkit2007"]
        if args.dataset == "voc_0712":
            devkits.append("VOCdevkit2012")
        for d in devkits:
            root = os.path.join(args.data_dir, d)
            year = d[-4:]
            for sub in ("Annotations", "JPEGImages",
                        os.path.join("ImageSets", "Main")):
                if not os.path.isdir(os.path.join(root, f"VOC{year}", sub)):
                    _fail(f"missing {root}/VOC{year}/{sub} "
                          f"(standard VOC devkit layout)")
    print("[released_parity] data layout ok")


def main(argv=None):
    args = parse_args(argv)
    check_layout(args)

    os.makedirs(args.out_dir, exist_ok=True)
    pkl = os.path.join(args.out_dir, "converted_params.pkl")

    import convert_torch_checkpoint as conv_cli
    print(f"[released_parity] converting {args.pth} -> {pkl}")
    conv_cli.main(["--input", args.pth, "--output", pkl,
                   "--kind", "detector"])

    import test_net as eval_cli
    eval_argv = [
        "--dataset", args.dataset, "--net", args.net,
        "--data_dir", args.data_dir,
        "--seen", str(args.seen), "--a", str(args.average),
        "--bs", str(args.batch_size), "--nw", str(args.num_workers),
        "--pretrained", pkl,
        "--output_dir", os.path.join(args.out_dir, "eval"),
    ]
    if args.group:
        eval_argv += ["--g", str(args.group)]
    if args.fuse_shots:
        eval_argv += ["--fuse_shots"]
    if args.set_cfgs:
        eval_argv += ["--set"] + list(args.set_cfgs)
    print(f"[released_parity] eval: test_net.py {' '.join(eval_argv)}")
    results = eval_cli.main(eval_argv)

    key = "AP50" if args.dataset == "coco" else "mAP"
    per_shot = [100.0 * r[key] for r in results]
    measured = sum(per_shot) / len(per_shot)
    target = (args.expected if args.expected is not None
              else PUBLISHED["coco" if args.dataset == "coco"
                             else "pascal_voc"])
    print("=" * 64)
    print(f"[released_parity] {args.dataset} {args.net} seen={args.seen} "
          f"a={args.average}")
    for i, v in enumerate(per_shot):
        print(f"  shot {i}: AP50 = {v:.2f}")
    print(f"  measured AP50 (avg over {len(per_shot)} shots): "
          f"{measured:.2f}")
    print(f"  reference target:                    {target:.2f} "
          f"(README.md:10)")
    delta = measured - target
    print(f"  delta: {delta:+.2f} points")
    print("=" * 64)
    ok = args.no_gate or delta >= -args.tolerance
    if not ok:
        print(f"[released_parity] BELOW target by {-delta:.2f} > "
              f"tolerance {args.tolerance}; bisect with the per-module "
              f"parity tests (tests/test_e2e_torch_parity.py, "
              f"tests/test_system_parity*.py)", file=sys.stderr)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
