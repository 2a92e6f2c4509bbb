"""Train-step batch sweep: pairs/sec/chip + achieved TFLOP/s + MFU%.

VERDICT round-3 ask: one auditable MFU number next to the pairs/sec headline,
post-round-3, at several batch sizes — is the recipe-faithful bs=8
(TRAIN.IMS_PER_BATCH analog; the reference trains bs=8 over 4 GPUs,
trainval_net_voc.py:321-326) also the pairs/sec/chip-optimal point?

Method identical to bench.py (which this reuses): production uint8 input
format, rotated batches + per-iter keys staged on device before the timed
window, hard host-transfer sync (block_until_ready is unreliable through
the remote-device tunnel).  FLOPs come from XLA's own cost model
(compiled.cost_analysis()['flops']) on the exact compiled step, so the
MFU% is auditable: flops / step_time / PEAK.

Usage: python tools/batch_sweep.py [--sizes 8 16 32] [--iters 15]
"""

from __future__ import annotations

import argparse
import json
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

# TPU v5e (v5 lite) bf16 peak per chip; the public spec number.
PEAK_TFLOPS = float(os.environ.get("AIT_PEAK_TFLOPS", "197"))


def sweep_one(bs: int, warmup: int, iters: int):
    import numpy as np
    import jax.numpy as jnp

    from __graft_entry__ import _batch, _flagship, _init_params
    from ait_tpu.data.transforms import space_to_depth
    from ait_tpu.train import (TrainState, lr_schedule, make_optimizer,
                               make_train_step)

    cfg, model = _flagship()
    h, w = cfg.tpu.image_size

    def make_uint8_batch(seed):
        b = _batch(bs, h, w, g=cfg.MAX_NUM_GT_BOXES, seed=seed)
        b["image"] = jnp.asarray(space_to_depth(
            (np.asarray(b["image"]) * 255).astype(np.uint8)))
        b["query"] = jnp.asarray(
            (np.asarray(b["query"]) * 255).astype(np.uint8))
        return b

    dev = jax.devices()[0]
    batches = jax.device_put([make_uint8_batch(0), make_uint8_batch(1)], dev)
    params = _init_params(model, _batch(1, 160, 160))
    tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
    state = jax.device_put(TrainState.create(params, tx), dev)
    keys = list(jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), warmup + iters), dev))

    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    # AOT-compile once so cost_analysis sees the exact program being timed
    compiled = step.lower(state, batches[0], keys[0]).compile()
    flops = float(compiled.cost_analysis().get("flops", 0.0))

    for i in range(warmup):
        state, metrics = step(state, batches[i % 2], keys[i])
    float(metrics["loss"])  # hard sync (tunnel-safe)

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batches[i % 2], keys[warmup + i])
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters

    tflops = flops / dt / 1e12
    return {
        "batch": bs,
        "step_ms": round(dt * 1e3, 2),
        "pairs_per_sec": round(bs / dt, 2),
        "model_gflop_per_step": round(flops / 1e9, 1),
        "achieved_tflops": round(tflops, 1),
        "mfu_pct": round(100 * tflops / PEAK_TFLOPS, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--iters", type=int, default=15)
    args = ap.parse_args(argv)

    rows = []
    for bs in args.sizes:
        try:
            row = sweep_one(bs, args.warmup, args.iters)
        except Exception as e:  # e.g. HBM OOM at large bs — report, continue
            row = {"batch": bs, "error": f"{type(e).__name__}: {e}"[:300]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    main()
