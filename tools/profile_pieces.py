"""Piecewise on-chip step profile: times jittable sub-programs of the
flagship model (no jax.profiler needed — device traces don't materialize
through the axon tunnel, tools/profile_step.py covers real TPU VMs).

Measures: train fwd-only, full train step (+ cost_analysis FLOPs ->
achieved TFLOP/s), eval forward at 300 proposals, and the query-branch
backbone.  Round-2 numbers are recorded in PERFORMANCE.md.

Usage: python tools/profile_pieces.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from __graft_entry__ import _flagship, _batch, _init_params
from ait_tpu.data.transforms import space_to_depth
from ait_tpu.train import TrainState, lr_schedule, make_optimizer, make_train_step, make_eval_step
from ait_tpu.train.state import batch_tuple

cfg, model = _flagship()
h, w = cfg.tpu.image_size
B = 8
batch = _batch(B, h, w, g=cfg.MAX_NUM_GT_BOXES)
batch["image"] = jnp.asarray(space_to_depth((np.asarray(batch["image"]) * 255).astype(np.uint8)))
batch["query"] = jnp.asarray((np.asarray(batch["query"]) * 255).astype(np.uint8))
params = _init_params(model, _batch(1, 160, 160))
dev = jax.devices()[0]
params = jax.device_put(params, dev)
batch = jax.device_put(batch, dev)

def timeit(f, *a, iters=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(iters):
        o = f(*a)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / iters * 1e3

# 1. train fwd only (losses, no grad)
def fwd_loss(p, b, rng):
    drop, samp = jax.random.split(rng)
    out = model.apply({"params": p}, *batch_tuple(b), train=True,
                      rngs={"dropout": drop, "sampling": samp})
    return out.total_loss
f1 = jax.jit(fwd_loss)
ms = timeit(f1, params, batch, jax.random.PRNGKey(0))
print(f"train fwd-only: {ms:.1f} ms")

# 2. full train step (fwd+bwd+opt)
tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
state = jax.device_put(TrainState.create(params, tx), dev)
step = jax.jit(make_train_step(model, tx))
def run_step(s, b, r):
    s2, m = step(s, b, r)
    return m["loss"]
o = step(state, batch, jax.random.PRNGKey(0)); jax.block_until_ready(o[1]["loss"])
t0 = time.perf_counter()
for _ in range(20):
    _, m = step(state, batch, jax.random.PRNGKey(0))
jax.block_until_ready(m["loss"])
ms_step = (time.perf_counter() - t0) / 20 * 1e3
print(f"train full step: {ms_step:.1f} ms")
c = step.lower(state, batch, jax.random.PRNGKey(0)).compile().cost_analysis()
fl = c.get("flops", 0.0)
print(f"step flops: {fl/1e9:.0f} GFLOP -> {fl/(ms_step/1e3)/1e12:.1f} TFLOP/s achieved")

# 3. eval fwd
ev = jax.jit(make_eval_step(model))
ms = timeit(ev, params, batch)
print(f"eval fwd (300 props): {ms:.1f} ms")

# 4. query backbone fwd+bwd
from ait_tpu.models.resnet import ResNetBackbone
bb = ResNetBackbone(cfg.model.backbone, dtype=jnp.bfloat16)
qimg = jnp.asarray(np.random.RandomState(0).rand(B, 128, 128, 3), jnp.float32)
qimg = jax.device_put(qimg, dev)
bp = params["backbone"]
def qloss(p, x):
    return (bb.apply({"params": p}, x).astype(jnp.float32) ** 2).mean()
qg = jax.jit(jax.value_and_grad(qloss))
ms = timeit(qg, bp, qimg)
print(f"query backbone fwd+bwd (128x128): {ms:.1f} ms")
