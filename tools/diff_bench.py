"""Ablation diff-bench: price a component by removing it from the train step.

Runs the SAME full train step as bench.py, with one component ablated, and
prints ms/step.  The difference vs `--mode base` prices the component
(shapes are unchanged, so everything else compiles identically).  Timing
only — the ablated steps are numerically meaningless.

Modes:
  base        the production step (should reproduce bench.py)
  no_coatt    co-attention replaced by identity (prices the whole block)
  det_coatt   co-attention runs with deterministic=True (prices its dropout)
  longseq     enable the fused Pallas co-attention path (default off)
  no_topk     proposal layer's pre-NMS top-k replaced by a static slice
              (prices the 22800 -> 12000 sort)
  pre6000     TRAIN.RPN_PRE_NMS_TOP_N=6000 (top-k + NMS at half candidates)
  no_ait      AIT transformer replaced by identity pad-to-query-grid
              (prices the enc-dec head fwd+bwd)
  no_sk       SKNet replaced by identity (prices both SK blocks fwd+bwd)
  no_top      ResNetTop (layer4 on 1024 rois + query) replaced by a mean
              pool (prices the heaviest per-roi conv stack fwd+bwd)
  no_roialign roi_align replaced by a static corner crop broadcast
              (prices the interpolation-matrix contractions fwd+bwd)
  no_targets  anchor/proposal target layers replaced by zero tensors
              (prices the fixed-shape target assignment, fwd-only graph)
  frozen_bb   stop_gradient after both backbone applies (prices the
              backbone backward pass)
  dec_prefix_off
              disable the default-on per-image decoder prefix (restores
              reference-exact iid per-proposal dropout masks); the delta
              vs base prices the shared prefix

Usage: python tools/diff_bench.py --mode base no_coatt det_coatt
"""

from __future__ import annotations

import argparse
import dataclasses
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


def _apply_mode(mode: str, cfg):
    """Returns (cfg, undo) — patches applied module-level where needed."""
    import ait_tpu.models.coattention as coatt_mod

    if mode == "base":
        return cfg
    if mode == "no_coatt":
        class _Identity(coatt_mod.MHACoAttention):
            def __call__(self, x_img, x_qry, *, deterministic=True):
                return x_img, x_qry

        coatt_mod.MHACoAttention = _Identity
        import ait_tpu.models.detector as det_mod
        det_mod.MHACoAttention = _Identity
        return cfg
    if mode == "det_coatt":
        orig = coatt_mod.MHACoAttention.__call__

        def det_call(self, x_img, x_qry, *, deterministic=True):
            return orig(self, x_img, x_qry, deterministic=True)

        coatt_mod.MHACoAttention.__call__ = det_call
        return cfg
    if mode == "longseq":
        # enable the long-sequence (co-attention) fused Pallas path (off by
        # default: measured +1.8 ms/step vs XLA at the flagship shapes)
        import ait_tpu.models.attention as attn_mod
        attn_mod._LONG_SEQ_FUSION = True
        return cfg
    if mode == "no_topk":
        # replace the pre-NMS top_k sort with a static slice (timing only);
        # the order gather downstream stays, so the delta prices the sort
        import ait_tpu.ops.nms as nms_mod
        import jax.numpy as jnp

        class _LaxProxy:
            @staticmethod
            def top_k(x, k):
                v = jax.lax.slice_in_dim(x, 0, k, axis=-1)
                return v, jnp.broadcast_to(
                    jnp.arange(k, dtype=jnp.int32), v.shape)

            def __getattr__(self, name):
                return getattr(jax.lax, name)

        nms_mod.lax = _LaxProxy()
        return cfg
    if mode == "pre6000":
        return cfg.replace(TRAIN=dataclasses.replace(
            cfg.TRAIN, RPN_PRE_NMS_TOP_N=6000))
    if mode == "dec_prefix_off":
        # disable the (default-on) train-time per-image decoder prefix,
        # restoring reference-exact iid per-proposal dropout masks; the
        # delta vs base prices the shared prefix
        # (see TpuConfig.dec_prefix_per_image)
        return cfg.replace(tpu=dataclasses.replace(
            cfg.tpu, dec_prefix_per_image=False))

    import flax.linen as nn
    import jax.numpy as jnp
    import ait_tpu.models.detector as det_mod

    if mode == "no_ait":
        class _IdT(nn.Module):
            def __call__(self, props, qry, deterministic=True):
                pad = qry.shape[1] - props.shape[1]
                return jnp.pad(
                    props, ((0, 0), (0, pad), (0, pad), (0, 0)))

        det_mod.AITTransformer = lambda **kw: _IdT()
        return cfg
    if mode == "no_sk":
        class _IdSK(nn.Module):
            def __call__(self, props, qry):
                return props, qry

        det_mod.SKNet = lambda ch, gate, dtype: _IdSK()
        return cfg
    if mode == "no_top":
        class _MeanTop(nn.Module):
            def __call__(self, x, deterministic=True):
                m = x.mean(axis=(1, 2))
                return jnp.concatenate([m, m], axis=-1)  # C=1024 -> 2048

        det_mod.ResNetTop = lambda name, dtype: _MeanTop()
        return cfg
    if mode == "no_roialign":
        def fake_align(feat, boxes, *, out_size, spatial_scale,
                       sampling_ratio=0):
            b, r = boxes.shape[0], boxes.shape[1]
            crop = feat[:, :out_size, :out_size, :]
            return jnp.broadcast_to(
                crop[:, None], (b, r) + crop.shape[1:])

        det_mod.roi_align = fake_align
        return cfg
    if mode == "no_targets":
        import ait_tpu.models.targets as tgt_mod

        def fake_at(anchors, gt_boxes, im_info, key, **kw):
            bsz, n = gt_boxes.shape[0], anchors.shape[0]
            z = jnp.zeros
            return tgt_mod.AnchorTargets(
                z((bsz, n), jnp.int32), z((bsz, n, 4)), z((bsz, n, 4)),
                z((bsz, n, 4)))

        def fake_pt(rois, gt_boxes, key, *, rois_per_image=128, **kw):
            bsz, r = rois.shape[0], rois_per_image
            z = jnp.zeros
            return tgt_mod.ProposalTargets(
                rois[:, :r], z((bsz, r), jnp.int32), z((bsz, r, 4)),
                z((bsz, r, 4)), z((bsz, r, 4)))

        det_mod.anchor_targets = fake_at
        det_mod.proposal_targets = fake_pt
        return cfg
    if mode == "frozen_bb":
        import ait_tpu.models.resnet as rn_mod

        orig_call = rn_mod.ResNetBackbone.__call__

        def frozen_call(self, x, return_stages=False):
            out = orig_call(self, x, return_stages=return_stages)
            return jax.tree_util.tree_map(jax.lax.stop_gradient, out)

        rn_mod.ResNetBackbone.__call__ = frozen_call
        return cfg
    raise ValueError(mode)


def run(mode: str) -> float:
    import numpy as np
    import jax.numpy as jnp

    from __graft_entry__ import _batch, _flagship, _init_params
    from ait_tpu.data.transforms import space_to_depth
    from ait_tpu.train import (TrainState, lr_schedule, make_optimizer,
                               make_train_step)

    cfg, _ = _flagship()
    cfg = _apply_mode(mode, cfg)
    from ait_tpu.models import AITDetector
    model = AITDetector(cfg, dtype=jnp.bfloat16)

    h, w = cfg.tpu.image_size
    batch = _batch(BATCH, h, w, g=cfg.MAX_NUM_GT_BOXES)
    batch["image"] = jnp.asarray(space_to_depth(
        (np.asarray(batch["image"]) * 255).astype(np.uint8)))
    batch["query"] = jnp.asarray(
        (np.asarray(batch["query"]) * 255).astype(np.uint8))
    params = _init_params(model, _batch(1, 160, 160))
    tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
    state = TrainState.create(params, tx)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    batch = jax.device_put(batch, dev)

    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    rng = jax.random.PRNGKey(0)
    for _ in range(WARMUP):
        state, metrics = step(state, batch, rng)
    float(metrics["loss"])  # hard sync (device_get drains the queue)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, batch, rng)
    float(metrics["loss"])
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", nargs="+", default=["base"])
    args = ap.parse_args()
    results = {}
    for mode in args.mode:
        # fresh subprocess per mode so monkeypatches can't leak
        if len(args.mode) > 1:
            import subprocess
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--mode", mode],
                capture_output=True, text=True)
            line = [ln for ln in out.stdout.splitlines() if "ms/step" in ln]
            print(out.stdout.strip() or out.stderr[-2000:])
            if line:
                results[mode] = float(line[-1].split()[1])
        else:
            ms = run(mode)
            print(f"{mode}: {ms:.2f} ms/step")
            results[mode] = ms
    if "base" in results and len(results) > 1:
        for m, v in results.items():
            if m != "base":
                print(f"delta {m}: {v - results['base']:+.2f} ms")


if __name__ == "__main__":
    main()
