#!/usr/bin/env python
"""One-shot detection training CLI.

Unifies the reference's `trainval_net_voc.py` / `trainval_net_coco.py`
(which differ by 2 lines — the co-attention flavor import) behind one
entry point with the same flags (--dataset/--net/--bs/--lr/--lr_decay_step/
--seen/--g/--session/--version/--epochs/--r ...).  The dataset choice picks
the co-attention flavor exactly as the reference's imports do: VOC -> MHA
pair, COCO -> non-local (SURVEY.md §2.2).

TPU execution model: one donated jit train step, data-parallel over every
visible device via a named mesh; orbax checkpoints per epoch + every
--checkpoint_interval steps with auto-resume (--r true).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor AIT_PLATFORM even where sitecustomize pins jax_platforms (axon)
if os.environ.get("AIT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["AIT_PLATFORM"])

# persistent compile cache: repeat CLI runs skip the minutes-long cold
# XLA/Mosaic compiles (same policy as bench.py / tools/*)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# hardware RNG for dropout/sampling keys: threefry mask generation
# profiled at ~7 ms/train-step; rbg lowers to the TPU RngBitGenerator
jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp
import numpy as np

from ait_tpu.config import Config
from ait_tpu.data import OneShotLoader, device_prefetch
from ait_tpu.data import coco as coco_data
from ait_tpu.data import voc as voc_data
from ait_tpu.models import AITDetector
from ait_tpu.parallel import make_mesh, replicate
from ait_tpu.train import (TrainState, init_params, lr_schedule,
                           make_optimizer, make_train_step)
from ait_tpu.train.checkpoint import CheckpointManager, save_config
from ait_tpu.utils import AverageMeter, MetricWriter, ThroughputMeter, printer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the one-shot detector")
    p.add_argument("--dataset", default="pascal_voc_0712",
                   choices=["pascal_voc", "pascal_voc_0712", "coco"])
    p.add_argument("--net", default="res50",
                   choices=["res50", "res101", "vgg16"])
    p.add_argument("--start_epoch", type=int, default=1)
    p.add_argument("--epochs", dest="max_epochs", type=int, default=10)
    p.add_argument("--disp_interval", type=int, default=20)
    p.add_argument("--checkpoint_interval", type=int, default=10000)
    p.add_argument("--save_dir", default="models")
    p.add_argument("--data_dir", default="data")
    p.add_argument("--coco_set", default="2017_train",
                   help="coco <year>_<split>, e.g. 2017_train, 2014_minival")
    p.add_argument("--nw", dest="num_workers", type=int, default=8)
    p.add_argument("--g", dest="group", type=int, default=0)
    p.add_argument("--seen", type=int, default=1)
    p.add_argument("--bs", dest="batch_size", type=int, default=8)
    # TPU extension: process the batch as N sequential microbatches per
    # optimizer step (same effective batch, 1/N the activation memory)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--cag", dest="class_agnostic", default=True)
    p.add_argument("--o", dest="optimizer", default="sgd",
                   choices=["sgd", "adam"])
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--lr_decay_step", type=int, default=4)
    p.add_argument("--lr_decay_gamma", type=float, default=0.1)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--session", type=int, default=1)
    p.add_argument("--r", dest="resume", default=False,
                   type=lambda s: str(s).lower() in ("1", "true", "yes"))
    p.add_argument("--version", default="1.0.0")
    p.add_argument("--ls", dest="large_scale", action="store_true")
    p.add_argument("--pretrained", default=None,
                   help="path to a converted backbone/model params pickle "
                        "(nested dict of arrays, the output of "
                        "tools/convert_torch_checkpoint.py)")
    p.add_argument("--debug", action="store_true",
                   help="truncate to 5 iters/epoch")
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[],
                   help="dotted-key config overrides, e.g. "
                        "TRAIN.RPN_PRE_NMS_TOP_N 6000")
    return p.parse_args(argv)


def build_config(args) -> Config:
    suffix = "_ls" if args.large_scale else ""
    name = (f"{args.net}_{args.group}{suffix}" if args.group != 0
            else f"{args.net}{suffix}")
    cfg_file = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "cfgs", f"{name}.yml")
    cfg = Config.from_yaml(cfg_file) if os.path.exists(cfg_file) else Config()
    printer("Config: ", cfg_file)

    # dataset-level overrides (trainval_net_voc.py:193-204)
    if args.dataset == "coco":
        cfg = cfg.override(["ANCHOR_SCALES", "(4, 8, 16, 32)",
                            "MAX_NUM_GT_BOXES", "50"])
        coatt = "nonlocal"
    else:
        cfg = cfg.override(["ANCHOR_SCALES", "(8, 16, 32)",
                            "MAX_NUM_GT_BOXES", "20"])
        coatt = "mha"
    backbone = {"res50": "resnet50", "res101": "resnet101",
                "vgg16": "vgg16"}[args.net]
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, backbone=backbone, coattention=coatt,
        channels=512 if backbone == "vgg16" else 1024,
        class_agnostic=bool(args.class_agnostic)))
    if args.set_cfgs:
        cfg = cfg.override(args.set_cfgs)
    return cfg


def build_view(args, cfg):
    cache = os.path.join(args.data_dir, "cache")
    if args.dataset == "coco":
        year, split = args.coco_set.split("_", 1)
        view = coco_data.load_coco(os.path.join(args.data_dir, "coco"),
                                   year, split, cache_dir=cache)
        return coco_data.filter_seen(view, args.seen,
                                     cfg.train_categories[0])
    sets = ([("2007", "trainval")] if args.dataset == "pascal_voc"
            else [("2007", "trainval"), ("2012", "trainval")])
    views = []
    for year, split in sets:
        devkit = os.path.join(args.data_dir, f"VOCdevkit{year}")
        v = voc_data.load_voc(devkit, year, split, cache_dir=cache)
        views.append(voc_data.filter_seen(v, args.seen))
    view = views[0]
    for other in views[1:]:  # multi-dataset merge (roidb.py:178-184)
        view.records.extend(other.records)
        for c, pool in other.cat_data.items():
            view.cat_data[c].extend(pool)
    return view


def load_pretrained(params, path):
    """Overlay a converted params pickle onto freshly-initialized params."""
    from ait_tpu.convert import load_pretrained as _load
    params, count = _load(params, path)
    printer(f"Loaded {count} pretrained arrays from ", path)
    return params


def main(argv=None):
    args = parse_args(argv)
    # multi-host TPU pods: initialize the distributed runtime when launched
    # under a cluster coordinator (same pjit program then spans hosts; XLA
    # runs the gradient psum over ICI/DCN — SURVEY.md §2.10)
    from ait_tpu.parallel import maybe_init_distributed
    maybe_init_distributed(printer)
    cfg = build_config(args)
    # fail fast on tensor-parallel misconfiguration (before any data/model
    # work): tp must divide the device count, the attention head count and
    # the FFN hidden width (Megatron sharding, parallel/tp.py)
    n_dev = jax.device_count()
    tp = int(cfg.tpu.tp_size)
    if tp > 1:
        if n_dev % tp != 0 or n_dev < tp:
            raise SystemExit(
                f"tpu.tp_size {tp}: needs a device count divisible by it, "
                f"have {n_dev}")
        if cfg.model.t_n_head % tp or cfg.model.t_d_inner % tp:
            raise SystemExit(
                f"tpu.tp_size {tp} must divide t_n_head "
                f"({cfg.model.t_n_head}) and t_d_inner "
                f"({cfg.model.t_d_inner})")
    np.random.seed(cfg.RNG_SEED)

    view = build_view(args, cfg)
    printer(f"{len(view.records)} roidb entries (pre-augment)")
    # per-host input pipeline (SURVEY §2.10): on a pod each host decodes only
    # its 1/process_count slice of every global batch; epoch order and batch
    # membership stay host-invariant inside the loader
    loader = OneShotLoader(view, cfg, training=True,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())
    printer(f"{len(loader)} training records after flip+filter")

    output_dir = os.path.join(args.save_dir, args.net, args.dataset,
                              args.version)
    os.makedirs(output_dir, exist_ok=True)
    save_config(output_dir, cfg)
    # one metrics stream per run: secondary pod hosts skip the writer (a
    # shared filesystem would interleave identical rows); orbax checkpoint
    # saves stay collective — every process must participate
    writer = (MetricWriter(os.path.join(output_dir, "logs"))
              if jax.process_index() == 0 else None)

    # conv/matmul compute dtype: --set tpu.compute_dtype float32 for
    # exact-parity runs (params stay f32 either way)
    dtype = jnp.dtype(cfg.tpu.compute_dtype)
    model = AITDetector(cfg, dtype=dtype)
    # params are laid out identically under tensor parallelism (heads are
    # sharded at COMPUTE time inside shard_map, not in storage), but the tp
    # model's in-model collectives need the 'model' axis, which only exists
    # inside the sharded step — so initialize with a tp=1 twin of the config
    if int(cfg.tpu.tp_size) > 1:
        cfg_init = cfg.replace(tpu=dataclasses.replace(cfg.tpu, tp_size=1))
        init_model = AITDetector(cfg_init, dtype=dtype)
    else:
        init_model = model
    params = init_params(init_model, cfg, jax.random.PRNGKey(cfg.RNG_SEED))
    if args.pretrained:
        params = load_pretrained(params, args.pretrained)

    steps_per_epoch = max(len(loader) // args.batch_size, 1)
    sched = lr_schedule(args.lr, steps_per_epoch, args.lr_decay_step,
                        args.lr_decay_gamma,
                        warmup_steps=args.warmup_steps)
    tx = make_optimizer(cfg, sched, optimizer=args.optimizer,
                        clip_norm=10.0 if args.net == "vgg16" else None)
    state = TrainState.create(params, tx)

    # data-parallel mesh over at most batch_size devices (the batch must
    # split evenly, like DataParallel's scatter; with --grad_accum A each
    # device shard must further split into A microbatches).  With
    # --set tpu.tp_size T > 1 the mesh gains a 'model' axis of size T and
    # attention heads / FFN hidden units shard Megatron-style (parallel/tp.py)
    if args.batch_size % args.grad_accum != 0:
        raise SystemExit(
            f"--grad_accum {args.grad_accum}: batch {args.batch_size} "
            "must be divisible by the microbatch count")
    dp_max = n_dev // tp
    dp = max(d for d in range(1, dp_max + 1)
             if args.batch_size % (d * args.grad_accum) == 0)
    n_use = dp * tp
    if tp > 1:
        mesh = make_mesh(n_use, axes=("data", cfg.tpu.tp_axis),
                         shape=(dp, tp))
    else:
        mesh = make_mesh(n_use)
    if n_use != n_dev:
        printer(f"Using {n_use}/{n_dev} devices (batch {args.batch_size} "
                f"must split into shards x {args.grad_accum} microbatches)",
                c="yellow")
    printer(f"Mesh: {dict(mesh.shape)}")
    state = replicate(state, mesh)

    ckpt = CheckpointManager(os.path.join(output_dir, "ckpt"))
    start_epoch = args.start_epoch
    if args.resume:
        latest = ckpt.latest_step()
        if latest is not None:
            state = ckpt.restore(state)
            start_epoch = latest // steps_per_epoch + 1
            printer(f"Resumed from step {latest} -> epoch {start_epoch}")

    accum = args.grad_accum
    if accum > 1:
        printer(f"Gradient accumulation: {accum} microbatches of "
                f"{args.batch_size // (n_use * accum)}/device per step")
    if mesh.devices.size > 1:
        # shard_map over the data axis: runs the Pallas kernels on the
        # LOCAL batch shard (GSPMD would replicate+all-gather them,
        # ait_tpu/parallel/sharded.py docstring)
        from ait_tpu.parallel import make_sharded_train_step
        step_fn = jax.jit(make_sharded_train_step(
            model, tx, mesh, accum_steps=accum,
            tp_axis=cfg.tpu.tp_axis if tp > 1 else None),
            donate_argnums=0)
    else:
        step_fn = jax.jit(make_train_step(model, tx, accum_steps=accum),
                          donate_argnums=0)
    rng = jax.random.PRNGKey(cfg.RNG_SEED + args.session)

    meters = {k: AverageMeter() for k in
              ("loss", "rpn_cls", "rpn_box", "rcnn_cls", "margin",
               "rcnn_box")}
    thru = ThroughputMeter()

    for epoch in range(start_epoch, args.max_epochs + 1):
        for m in meters.values():
            m.reset()
        thru.reset()
        from ait_tpu.parallel import batch_sharding
        batches = device_prefetch(
            loader.train_epoch(args.batch_size,
                               num_workers=args.num_workers),
            sharding=batch_sharding(mesh))
        for it, batch in enumerate(batches):
            if args.debug and it >= 5:
                break
            state, metrics = step_fn(state, batch, rng)
            thru.tick(args.batch_size)
            if (it + 1) % args.disp_interval == 0 or args.debug:
                metrics = jax.device_get(metrics)
                for k, m in meters.items():
                    m.update(float(metrics[k]))
                sps, pps = thru.rates()
                step = int(jax.device_get(state.step))
                printer(
                    f"[session {args.session}][epoch {epoch:2d}]"
                    f"[iter {it + 1:5d}/{steps_per_epoch}] ",
                    f"loss {meters['loss'].avg:.4f} "
                    f"(rpn {meters['rpn_cls'].avg:.3f}/"
                    f"{meters['rpn_box'].avg:.3f} "
                    f"rcnn {meters['rcnn_cls'].avg:.3f}/"
                    f"{meters['rcnn_box'].avg:.3f} "
                    f"margin {meters['margin'].avg:.3f}) "
                    f"fg/bg {int(metrics['fg_cnt'])}/"
                    f"{int(metrics['bg_cnt'])} "
                    f"| {sps:.2f} it/s, {pps:.1f} pairs/s")
                if writer is not None:
                    writer.write(step, {k: m.avg for k, m in meters.items()})
                    writer.write(step, {"steps_per_sec": sps,
                                        "pairs_per_sec": pps}, prefix="perf")
            step = int(jax.device_get(state.step))
            if step % args.checkpoint_interval == 0:
                # pass the sharded jax.Arrays straight to orbax: save is a
                # COLLECTIVE under multi-process (each host writes only the
                # shards it owns, the primary writes replicated arrays and
                # metadata) — a per-host device_get would race every host's
                # full copy into the same files.  orbax's device->host copy
                # completes inside save(), before the next donated step.
                ckpt.save(step, state,
                          metadata={"epoch": epoch, "session": args.session})
        step = int(jax.device_get(state.step))
        ckpt.save(step, state,
                  metadata={"epoch": epoch, "session": args.session},
                  force=True)
        printer(f"Saved checkpoint at epoch {epoch}, step {step}")
    ckpt.wait()
    if writer is not None:
        writer.close()
    printer("Training done.")


if __name__ == "__main__":
    main()
