"""Serving benchmark: eval forward + full on-device postprocess, batch 8.

Measures the number PERFORMANCE.md quotes for eval/serving (ms per batch-8
at 300 proposals/img incl. decode/clip/rescale/NMS/top-100), on the real
chip.  Usage: python tools/serve_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BATCH = 8
WARMUP = 2
ITERS = 10

if "--bs" in sys.argv:
    BATCH = int(sys.argv[sys.argv.index("--bs") + 1])


def main():
    import numpy as np
    import jax.numpy as jnp

    from __graft_entry__ import _batch, _flagship, _init_params
    from ait_tpu.data.transforms import space_to_depth
    from ait_tpu.evaluation import postprocess_detections
    from ait_tpu.train import make_eval_step

    cfg, model = _flagship()
    h, w = cfg.tpu.image_size
    batch = _batch(BATCH, h, w, g=cfg.MAX_NUM_GT_BOXES)
    batch["image"] = jnp.asarray(space_to_depth(
        (np.asarray(batch["image"]) * 255).astype(np.uint8)))
    batch["query"] = jnp.asarray(
        (np.asarray(batch["query"]) * 255).astype(np.uint8))
    params = _init_params(model, _batch(1, 160, 160))
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    batch = jax.device_put(batch, dev)

    if "--fold_bn" in sys.argv:
        # eval-time exact BN-into-conv fold (models/resnet.fold_frozen_bn)
        # + the bias-only program variant: the ~53 full-activation BN
        # multiplies disappear from the compiled eval program
        from ait_tpu.models import layers as layers_mod
        from ait_tpu.models.resnet import fold_frozen_bn
        params = jax.device_put(fold_frozen_bn(jax.device_get(params)), dev)
        layers_mod.BN_BIAS_ONLY = True
        print("serve_bench: frozen BN folded into conv kernels (bias-only)")

    ev = make_eval_step(model)
    t = cfg.TEST

    @jax.jit
    def serve(params, batch):
        out = ev(params, batch)
        dets, valid = postprocess_detections(
            out["rois"], out["cls_prob"], out["bbox_pred"],
            batch["im_info"], nms_thresh=t.NMS, score_thresh=0.0,
            max_per_image=t.MAX_PER_IMAGE,
            bbox_normalize_means=cfg.TRAIN.BBOX_NORMALIZE_MEANS,
            bbox_normalize_stds=cfg.TRAIN.BBOX_NORMALIZE_STDS)
        # scalar reduce inside the jit: pulling the det tensors through the
        # axon tunnel would swamp the timing (PERFORMANCE.md measurement trap)
        return dets.sum(), valid.sum()

    for _ in range(WARMUP):
        s, v = serve(params, batch)
    float(s)  # hard sync
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, v = serve(params, batch)
    float(s)
    dt = (time.perf_counter() - t0) / ITERS
    print(f"serving: {dt * 1e3:.1f} ms/batch-{BATCH} "
          f"({BATCH / dt:.1f} pairs/sec/chip)")

    # ---- shot-fused serving (--a 4 protocol): U unique images x 4 shots
    # share one image-backbone pass (train.make_fused_eval_step); same
    # pair batch, so the delta is pure amortization
    from ait_tpu.train import make_fused_eval_step

    shots = 4
    u = BATCH // shots
    fb = {
        "image": batch["image"][:u],
        "query": batch["query"][:u * shots].reshape(
            (u, shots) + batch["query"].shape[1:]),
        "im_info": batch["im_info"][:u],
        "gt_boxes": batch["gt_boxes"][:u],
    }
    fev = make_fused_eval_step(model)

    @jax.jit
    def serve_fused(params, fb):
        out = fev(params, fb)
        dets, valid = postprocess_detections(
            out["rois"], out["cls_prob"], out["bbox_pred"],
            out["im_info"], nms_thresh=t.NMS, score_thresh=0.0,
            max_per_image=t.MAX_PER_IMAGE,
            bbox_normalize_means=cfg.TRAIN.BBOX_NORMALIZE_MEANS,
            bbox_normalize_stds=cfg.TRAIN.BBOX_NORMALIZE_STDS)
        return dets.sum(), valid.sum()

    for _ in range(WARMUP):
        s, v = serve_fused(params, fb)
    float(s)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, v = serve_fused(params, fb)
    float(s)
    dt_f = (time.perf_counter() - t0) / ITERS
    print(f"serving fused (--a {shots}, {u} imgs): "
          f"{dt_f * 1e3:.1f} ms/batch-{BATCH} "
          f"({BATCH / dt_f:.1f} pairs/sec/chip, "
          f"{dt / dt_f:.2f}x vs per-pass)")


if __name__ == "__main__":
    main()
