#!/usr/bin/env python
"""One-shot detection evaluation CLI.

Unifies the reference's `test_net_voc.py` / `test_net_coco.py`: iterate the
(image x class) pair list `--a N` times with a different deterministic query
shot per pass (`dataset.query_position = avg`, test_net_voc.py:320-322),
cache detections per pass, evaluate each pass (VOC AP table or COCO
class-restricted AP).

TPU redesign: the reference runs bs=1 with host-side per-image postprocess;
here inference AND postprocess (decode, clip, rescale, NMS, top-100) run as
one batched jit — the host only assembles `all_boxes`.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pickle
import sys
import time

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

import jax.numpy as jnp
import numpy as np

from ait_tpu.data import OneShotLoader
from ait_tpu.data import coco as coco_data
from ait_tpu.data import voc as voc_data
from ait_tpu.evaluation import evaluate_voc, postprocess_detections
from ait_tpu.evaluation.coco_eval import COCODetEval, dets_to_coco_results
from ait_tpu.models import AITDetector
from ait_tpu.train import init_params, make_eval_step
from ait_tpu.train.checkpoint import CheckpointManager
from ait_tpu.utils import printer

from trainval_net import build_config  # shared dataset/cfg dispatch


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate the one-shot detector")
    p.add_argument("--dataset", default="pascal_voc_0712",
                   choices=["pascal_voc", "pascal_voc_0712", "coco"])
    p.add_argument("--net", default="res50",
                   choices=["res50", "res101", "vgg16"])
    p.add_argument("--save_dir", default="models")
    p.add_argument("--data_dir", default="data")
    p.add_argument("--coco_set", default="2017_val",
                   help="coco <year>_<split>, e.g. 2017_train, 2014_minival")
    p.add_argument("--nw", dest="num_workers", type=int, default=8)
    p.add_argument("--g", dest="group", type=int, default=0)
    p.add_argument("--seen", type=int, default=2)
    p.add_argument("--a", dest="average", type=int, default=1,
                   help="number of query shots to average over")
    p.add_argument("--bs", dest="batch_size", type=int, default=8,
                   help="eval batch size (the reference is fixed at 1)")
    p.add_argument("--session", dest="checksession", type=int, default=1)
    p.add_argument("--checkpoint_path", default=None,
                   help="explicit orbax checkpoint dir (else derived from "
                        "save_dir/net/dataset/version)")
    p.add_argument("--pretrained", default=None,
                   help="converted torch-checkpoint params pickle "
                        "(tools/convert_torch_checkpoint.py output) to "
                        "evaluate directly, bypassing orbax — the "
                        "released-.pth AP-parity path "
                        "(reference test_net_voc.py:275-276 loads the .pth "
                        "state_dict the same way)")
    p.add_argument("--version", default="1.0.0")
    p.add_argument("--ls", dest="large_scale", action="store_true")
    p.add_argument("--cag", dest="class_agnostic", default=True)
    p.add_argument("--with_cache_file", action="store_true",
                   help="reuse cached detections instead of re-running")
    p.add_argument("--fuse_shots", action="store_true",
                   help="evaluate all --a query shots in one sweep, "
                        "computing the target-image backbone once per "
                        "image instead of once per shot (single-device; "
                        "same detections as the per-pass protocol)")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--debug", action="store_true",
                   help="truncate to 10 pairs")
    p.add_argument("--vis", dest="visualization", action="store_true",
                   help="write detection overlays to ./test_img "
                        "(reference test_net_voc.py:475-489)")
    p.add_argument("--write_results", action="store_true",
                   help="VOC only: also write official devkit result files "
                        "(pascal_voc.py:312-328) under "
                        "<data_dir>/VOCdevkit2007/results, tagged by the "
                        "experiment.info comp-id")
    p.add_argument("--set", dest="set_cfgs", nargs="*", default=[])
    return p.parse_args(argv)


def build_view(args, cfg):
    cache = os.path.join(args.data_dir, "cache")
    if args.dataset == "coco":
        year, split = args.coco_set.split("_", 1)
        view = coco_data.load_coco(os.path.join(args.data_dir, "coco"),
                                   year, split, cache_dir=cache)
        return coco_data.filter_seen(view, args.seen,
                                     cfg.test_categories[0])
    devkit = os.path.join(args.data_dir, "VOCdevkit2007")
    v = voc_data.load_voc(devkit, "2007", "test", cache_dir=cache)
    return voc_data.filter_seen(v, args.seen)


def _save_vis(loader, rec_idx, dets, query, out_dir, pair_idx):
    import cv2
    import imageio.v2 as imageio

    from ait_tpu.utils.visualize import compose_with_query, draw_detections

    rec = loader.view.records[rec_idx]
    im = np.asarray(imageio.imread(rec.image_path))
    if im.ndim == 2:
        im = np.repeat(im[:, :, None], 3, axis=2)
    im = draw_detections(im, dets, thresh=0.8)
    im = compose_with_query(im, query)
    os.makedirs(out_dir, exist_ok=True)
    cv2.imwrite(os.path.join(out_dir, f"{pair_idx}_d.png"),
                im[:, :, ::-1])  # RGB -> BGR for cv2


def _put(v, sharding):
    if sharding is None:
        return jnp.asarray(v)
    if jax.process_count() > 1:
        # this host's loader shard -> its slice of the global batch
        return jax.make_array_from_process_local_data(sharding,
                                                      np.asarray(v))
    return jax.device_put(np.asarray(v), sharding)


def run_pass(loader, eval_step, post, params, args, allowed,
             sharding=None):
    """One query-shot pass -> all_boxes[class][record_index] (this host's
    pairs only under multi-process; the caller merges)."""
    from ait_tpu.parallel import host_local_rows

    all_boxes = {ci: {} for ci in allowed}
    done = set()
    t0 = time.time()
    n_pairs = len(loader.pairs)
    for batch in loader.test_epoch(args.batch_size,
                                   num_workers=args.num_workers):
        dev = {k: _put(v, sharding) for k, v in batch.items()
               if k in ("image", "query", "im_info", "gt_boxes",
                        "num_boxes")}
        out = eval_step(params, dev)
        dets, valid = post(out["rois"], out["cls_prob"], out["bbox_pred"],
                           dev["im_info"])
        # under multi-process the global outputs are sharded; this host
        # owns exactly the rows its loader produced
        dets = host_local_rows(dets)
        valid = host_local_rows(valid)
        for i in range(len(batch["pair_index"])):
            pi = int(batch["pair_index"][i])
            if pi in done:
                continue
            done.add(pi)
            ci = int(batch["category"][i])
            ri = int(batch["record_index"][i])
            all_boxes[ci][ri] = dets[i][valid[i]]
            if args.visualization:
                _save_vis(loader, ri, all_boxes[ci][ri],
                          batch["query"][i], "test_img", pi)
        if len(done) % (50 * args.batch_size) < args.batch_size:
            rate = len(done) / max(time.time() - t0, 1e-9)
            printer(f"  {len(done)}/{n_pairs} pairs ",
                    f"({rate:.1f} pairs/s)")
        if args.debug and len(done) >= 10:
            break
    return all_boxes


def run_fused(loader, fused_step, post, params, args, allowed):
    """One sweep over unique pairs, all shots at once ->
    [all_boxes per shot].  Pair rows come back pair-major: shot a of
    unique pair u at row u * A + a (train.make_fused_eval_step)."""
    shots = args.average
    by_shot = [{ci: {} for ci in allowed} for _ in range(shots)]
    done = set()
    t0 = time.time()
    u = max(1, args.batch_size // shots)
    printer(f"Shot-fused pass: {u} images x {shots} shots per step")
    for batch in loader.test_epoch_fused(u, shots,
                                         num_workers=args.num_workers):
        dev = {k: jax.device_put(np.asarray(v)) for k, v in batch.items()
               if k in ("image", "query", "im_info", "gt_boxes")}
        out = fused_step(params, dev)
        dets, valid = post(out["rois"], out["cls_prob"], out["bbox_pred"],
                           out["im_info"])
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        for i in range(len(batch["pair_index"])):
            pi = int(batch["pair_index"][i])
            if pi in done:
                continue
            done.add(pi)
            ci = int(batch["category"][i])
            ri = int(batch["record_index"][i])
            for a in range(shots):
                row = i * shots + a
                by_shot[a][ci][ri] = dets[row][valid[row]]
            if args.visualization:
                _save_vis(loader, ri, by_shot[0][ci][ri],
                          batch["query"][i][0], "test_img", pi)
        if len(done) % (50 * u) < u:
            rate = len(done) * shots / max(time.time() - t0, 1e-9)
            printer(f"  {len(done)}/{len(loader.pairs)} unique pairs "
                    f"({rate:.1f} pairs/s incl. shots)")
        # same truncation contract as run_pass: --debug covers the first
        # 10 pairs so fused-vs-per-pass comparisons see identical sets
        if args.debug and len(done) >= 10:
            break
    return by_shot


def main(argv=None):
    args = parse_args(argv)
    # pod eval: same SPMD program on every host; each host decodes and
    # postprocesses only its slice of the pair list, detections are merged
    # across hosts before AP (parallel/multihost.py)
    from ait_tpu.parallel import maybe_init_distributed
    maybe_init_distributed(printer)
    proc0 = jax.process_index() == 0
    cfg = build_config(args)
    # adopt train-time architecture knobs saved next to the checkpoint
    # (the reference restores POOLING_MODE from its ckpt dict,
    # test_net_voc.py:277-278)
    run_dir = os.path.dirname(args.checkpoint_path) if args.checkpoint_path \
        else os.path.join(args.save_dir, args.net, args.dataset,
                          args.version)
    cfg_json = os.path.join(run_dir, "config.json")
    if os.path.exists(cfg_json):
        import json
        saved = json.load(open(cfg_json))
        cfg = cfg.override(["POOLING_MODE", repr(saved["POOLING_MODE"])])
        # adopt the ENTIRE saved model block — evaluating with any
        # architecture knob different from the run's would silently build
        # the wrong model
        known = {f.name for f in dataclasses.fields(cfg.model)}
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, **{k: v for k, v in saved["model"].items()
                          if k in known}))
        printer("Adopted train-time knobs from ", cfg_json)
    view = build_view(args, cfg)
    printer(f"{len(view.records)} eval images, "
            f"{len(view.allowed_classes)} classes under test")

    # conv/matmul compute dtype: --set tpu.compute_dtype float32 for
    # exact-parity runs (params stay f32 either way)
    dtype = jnp.dtype(cfg.tpu.compute_dtype)
    model = AITDetector(cfg, dtype=dtype)
    # sequence parallelism (--set tpu.sp_size S): the sp model's in-model
    # 'seq'-axis collectives exist only inside the sharded eval step, so
    # initialize/restore with an sp=1 twin — the param layout is identical
    # (sequence shards are sliced at COMPUTE time, parallel/sp.py)
    if int(cfg.tpu.sp_size) > 1:
        cfg_init = cfg.replace(tpu=dataclasses.replace(cfg.tpu, sp_size=1))
        init_model = AITDetector(cfg_init, dtype=dtype)
    else:
        init_model = model
    params = init_params(init_model, cfg, jax.random.PRNGKey(cfg.RNG_SEED))
    ckpt_dir = args.checkpoint_path or os.path.join(
        args.save_dir, args.net, args.dataset, args.version, "ckpt")
    ckpt_step = 0
    if args.pretrained:
        from ait_tpu.convert import load_pretrained
        params, n_loaded = load_pretrained(params, args.pretrained)
        printer(f"Loaded {n_loaded} converted arrays from ", args.pretrained)
    elif os.path.isdir(ckpt_dir):
        from ait_tpu.train import TrainState, lr_schedule, make_optimizer
        tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
        template = TrainState.create(params, tx)
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore(template)
        if restored is not None:
            params = restored.params
            ckpt_step = mgr.latest_step()
            printer(f"Loaded checkpoint step {ckpt_step} from ", ckpt_dir)
        else:
            printer("WARNING: no checkpoint found, evaluating random init",
                    c="yellow")
    else:
        printer("WARNING: no checkpoint dir, evaluating random init",
                c="yellow")

    # multi-device eval: shard the pair batch over a 'data' mesh and run the
    # eval forward as ONE shard_map program on every visible chip — the
    # reference serves bs=1 on a single GPU (test_net_voc.py:330-339); the
    # sharded step is parity-tested vs per-image eval in
    # tests/test_sharded_step.py.  With --set tpu.sp_size S > 1 the mesh
    # gains a 'seq' axis and the co-attention's image-token sequence shards
    # over it (parallel/sp.py) — serving canvases whose token sequence
    # outgrows one chip; parity on a ('data','seq') mesh in tests/test_sp.py
    n_dev = jax.device_count()
    sp = int(cfg.tpu.sp_size)
    if sp > 1 and (n_dev < sp or n_dev % sp != 0):
        raise SystemExit(f"tpu.sp_size {sp}: needs a device count "
                         f"divisible by it, have {n_dev}")
    dp = max(d for d in range(1, n_dev // sp + 1)
             if args.batch_size % d == 0)
    n_use = dp * sp
    data_sharding = None
    if n_use > 1:
        from ait_tpu.parallel import (batch_sharding, make_mesh,
                                      make_sharded_eval_step, replicate)
        if sp > 1:
            mesh = make_mesh(n_use, axes=("data", cfg.tpu.sp_axis),
                             shape=(dp, sp))
        else:
            mesh = make_mesh(n_use)
        params = replicate(params, mesh)
        eval_step = jax.jit(make_sharded_eval_step(model, mesh))
        data_sharding = batch_sharding(mesh)
        printer(f"Eval mesh: {dict(mesh.shape)} ({n_use}/{n_dev} "
                f"device(s)), batch {args.batch_size}")
    else:
        eval_step = jax.jit(make_eval_step(model))
    # the reference thresholds at 0.0 and raises to 0.05 only under --vis
    # (test_net_voc.py:311-313)
    score_thresh = max(cfg.TEST.SCORE_THRESH,
                       0.05 if args.visualization else 0.0)
    post = jax.jit(lambda r, c, b, ii: postprocess_detections(
        r, c, b, ii, nms_thresh=cfg.TEST.NMS,
        score_thresh=score_thresh,
        max_per_image=cfg.TEST.MAX_PER_IMAGE,
        bbox_normalize_means=cfg.TRAIN.BBOX_NORMALIZE_MEANS,
        bbox_normalize_stds=cfg.TRAIN.BBOX_NORMALIZE_STDS))

    os.makedirs(args.output_dir, exist_ok=True)
    loader = OneShotLoader(view, cfg, training=False,
                           process_index=jax.process_index(),
                           process_count=jax.process_count())

    # run tag side-channel (reference writes it unconditionally at startup,
    # test_net_voc.py:223-225; the VOC writer reads it back as comp-id)
    from ait_tpu.evaluation import comp_id_tag, write_experiment_info
    comp_id = comp_id_tag(args.checksession, ckpt_step, args.version)
    if proc0:
        write_experiment_info(comp_id, os.path.join(args.output_dir,
                                                    "experiment.info"))

    # shot-fused eval (--fuse_shots): ONE sweep over unique pairs computes
    # all --a shots together; the image backbone — the heaviest
    # query-independent stage — runs once per image instead of once per
    # shot (train.make_fused_eval_step).  Detections per (shot, pair) are
    # identical to the per-pass protocol up to the exactness of the
    # feature gather (tests/test_cli_eval.py pins CLI-vs-CLI equality).
    fused_boxes = None
    if args.fuse_shots and not (args.average > 1
                                and not args.with_cache_file):
        # don't silently run the per-pass path when the user asked for
        # fusion: at --a 1 fusion is an identity gather (no savings) and
        # --with_cache_file skips inference entirely
        printer("--fuse_shots ignored: ",
                "it needs --a > 1 and no --with_cache_file")
    if args.fuse_shots and args.average > 1 and not args.with_cache_file:
        if jax.process_count() > 1:
            raise SystemExit("--fuse_shots is a single-host path; drop "
                             "it or the pod flags")
        from ait_tpu.train import make_fused_eval_step
        # single-device program: pull params off any eval mesh layout
        params_local = jax.device_put(jax.device_get(params))
        fused_boxes = run_fused(
            loader, jax.jit(make_fused_eval_step(model)), post,
            params_local, args, view.allowed_classes)

    results = []
    for avg in range(args.average):
        loader.query_position = avg
        tag = (f"sess{args.checksession}_g{args.group}_seen{args.seen}_{avg}"
               if args.group else f"sess{args.checksession}_seen"
                                  f"{args.seen}_{avg}")
        det_file = os.path.join(args.output_dir, tag + ".pkl")
        if args.with_cache_file and os.path.exists(det_file):
            with open(det_file, "rb") as f:
                all_boxes = pickle.load(f)
            printer("Loaded cached detections: ", det_file)
        elif fused_boxes is not None:
            all_boxes = fused_boxes[avg]
            if proc0:
                with open(det_file, "wb") as f:
                    pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)
        else:
            printer(f"Query-shot pass {avg + 1}/{args.average}")
            all_boxes = run_pass(loader, eval_step, post, params, args,
                                 view.allowed_classes,
                                 sharding=data_sharding)
            if jax.process_count() > 1:
                # each host evaluated a disjoint pair slice — merge, so
                # every host holds (and proc 0 caches) the full result
                from ait_tpu.parallel import (allgather_object,
                                              merge_all_boxes)
                all_boxes = merge_all_boxes(allgather_object(all_boxes))
            if proc0:
                with open(det_file, "wb") as f:
                    pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)

        if args.dataset == "coco":
            gt = view.coco_gt
            rec_to_img = {i: r.img_id for i, r in enumerate(view.records)}
            dets = dets_to_coco_results(all_boxes, rec_to_img,
                                        gt.class_ind_to_cat_id)
            ev = COCODetEval(gt, dets,
                             img_ids=[r.img_id for r in view.records])
            ev.evaluate()
            ev.accumulate()
            class_index = [c - 1 for c in view.allowed_classes]
            stats = ev.summarize(class_index=class_index)
            results.append({"AP50": float(stats[1]), "AP": float(stats[0])})
        else:
            if args.write_results and proc0:
                from ait_tpu.evaluation import write_voc_results_files
                paths = write_voc_results_files(
                    all_boxes, view.records, view.classes,
                    os.path.join(args.data_dir, "VOCdevkit2007"), "2007",
                    "test", f"{comp_id}_{avg}")
                printer(f"Wrote {len(paths)} devkit result files")
            res = evaluate_voc(
                all_boxes, view.records, view.allowed_classes,
                voc_data.class_order(args.seen))
            printer("  ".join(f"{k}={v * 100:.1f}" for k, v in res.items()))
            results.append(res)

    if results:
        key = "mAP" if args.dataset != "coco" else "AP50"
        mean = float(np.mean([r[key] for r in results]))
        printer(f"Averaged over {len(results)} shots: {key} = "
                f"{mean * 100:.2f}")
    return results


if __name__ == "__main__":
    main()
