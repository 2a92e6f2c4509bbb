"""Headline benchmark: query-target pairs/sec/chip, full training step.

One JSON line: {"metric", "value", "unit", "vs_baseline", "gate"}.

On real TPU the on-device kernel parity gate (tools/tpu_kernel_check.py:
Pallas NMS bit-equality, fused-attention fwd/bwd tolerance, shard_map==jit)
runs FIRST and a FAIL refuses to print a headline number — a kernel
regression can never produce a recorded benchmark.  `--no-gate` (or
AIT_BENCH_NO_GATE=1) skips it for local timing loops; a gate TIMEOUT
(cold Mosaic compiles through the axon tunnel can take many minutes) is
recorded as "timeout" rather than blocking the measurement.

Baseline derivation (BASELINE.md / SURVEY.md §6): the reference's own code
comments record a ~1.088s *forward-only* training step at bs=8 over 4 GPUs
(trainval_net_voc.py:373, faster_rcnn_sys_transformer_sk_dilat.py:198), i.e.
8 pairs / 1.088s / 4 chips = 1.84 pairs/sec/chip forward-only.  We charge
ourselves the FULL step (forward + backward + optimizer) against the
reference's forward-only number, so vs_baseline is conservative.
"""

from __future__ import annotations

import json
import os
import time

import jax

# hardware RNG for dropout/sampling keys: threefry mask generation
# profiled at ~7 ms/train-step; rbg lowers to the TPU RngBitGenerator
jax.config.update("jax_default_prng_impl", "rbg")

# persistent compile cache: only steady-state step time is measured, so
# caching is semantics-free and cuts repeat bench runs by minutes
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REFERENCE_PAIRS_PER_SEC_PER_CHIP = 8 / 1.088 / 4  # forward-only, see above

BATCH = 8
WARMUP = 3
ITERS = 30
GATE_TIMEOUT_S = 2400


def run_gate() -> str:
    """Run the on-device kernel parity gate; 'pass' | 'skipped' | 'timeout'.

    Exits the process (no headline line) if any kernel check FAILs.
    """
    import subprocess
    import sys

    if os.environ.get("AIT_BENCH_NO_GATE") == "1":
        return "skipped"
    if jax.devices()[0].platform != "tpu":
        return "skipped"  # the gate asserts REAL-chip Mosaic lowering
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "tools", "tpu_kernel_check.py")
    try:
        proc = subprocess.run([sys.executable, script],
                              timeout=GATE_TIMEOUT_S,
                              stdout=sys.stderr, stderr=sys.stderr)
    except subprocess.TimeoutExpired:
        print("kernel gate timed out (cold Mosaic compiles); benching "
              "anyway, gate recorded as timeout", file=sys.stderr)
        return "timeout"
    if proc.returncode != 0:
        print("kernel parity gate FAILED - refusing to record a benchmark",
              file=sys.stderr)
        raise SystemExit(1)
    return "pass"


def main(gate: bool = True):
    from __graft_entry__ import _batch, _flagship, _init_params
    from ait_tpu.train import (TrainState, lr_schedule, make_optimizer,
                               make_train_step)

    import jax.numpy as jnp
    import numpy as np

    from ait_tpu.data.transforms import space_to_depth

    gate_status = run_gate() if gate else "skipped"

    cfg, model = _flagship()
    h, w = cfg.tpu.image_size

    def make_uint8_batch(seed):
        b = _batch(BATCH, h, w, g=cfg.MAX_NUM_GT_BOXES, seed=seed)
        # production input format (what the loader ships): uint8 queries and
        # host space-to-depth'd uint8 images — the step now includes the
        # on-device normalization the uint8 path pays
        b["image"] = jnp.asarray(space_to_depth(
            (np.asarray(b["image"]) * 255).astype(np.uint8)))
        b["query"] = jnp.asarray(
            (np.asarray(b["query"]) * 255).astype(np.uint8))
        return b

    # two distinct batches, alternated, and a fresh key per timed iteration
    # (all staged to the device BEFORE the timed loop) — no iteration can
    # be constant-folded or cached against a repeated input
    batches = [make_uint8_batch(0), make_uint8_batch(1)]
    params = _init_params(model, _batch(1, 160, 160))
    tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
    state = TrainState.create(params, tx)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    batches = jax.device_put(batches, dev)
    keys = list(jax.device_put(
        jax.random.split(jax.random.PRNGKey(0), WARMUP + ITERS), dev))

    step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    for i in range(WARMUP):
        state, metrics = step(state, batches[i % 2], keys[i])
    # hard sync: device_get forces a full drain of the execution queue
    # (block_until_ready does not reliably block through the axon tunnel)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, batches[i % 2], keys[WARMUP + i])
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / ITERS

    pairs_per_sec = BATCH / dt
    print(json.dumps({
        "metric": "query-target pairs/sec/chip (R50 VOC, full train step)",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / REFERENCE_PAIRS_PER_SEC_PER_CHIP,
                             2),
        "gate": gate_status,
    }))


def main_pipeline(steps: int = 40, workers: int = 8, n_images: int = 24):
    """SUSTAINED throughput: disk -> loader -> prefetch -> train step.

    The headline bench above times a device-resident batch; the reference's
    1.088 s/step baseline was a REAL loop including its 8-worker DataLoader
    (trainval_net_voc.py:362-373).  This mode measures under the same rules:
    a synthetic on-disk VOC devkit at the production canvas, the C++/thread
    input pipeline (OneShotLoader -> device_prefetch), and the same jitted
    train step — wall clock includes every host-side stage.  On a 1-vCPU
    container the loader dominates; on a real TPU-VM host (180+ vCPUs) the
    pipeline overlaps under the step (PERFORMANCE.md discusses both).
    """
    import sys
    import tempfile

    import numpy as np

    from ait_tpu.data import OneShotLoader, device_prefetch
    from ait_tpu.data import voc as voc_data
    from ait_tpu.train import (TrainState, init_params, lr_schedule,
                               make_optimizer, make_train_step)
    from __graft_entry__ import _flagship

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests"))
    from fixtures import make_voc_devkit

    # VOC-shaped images (375x500 -> 600x800 at the 600 scale, the modal
    # real-dataset shape); enough distinct images that decode isn't served
    # from the page cache in lockstep
    rng = np.random.RandomState(0)
    fixture = []
    classes = ["pottedplant", "sofa", "tvmonitor", "car", "bottle", "boat",
               "chair", "person", "bus", "train", "horse", "bicycle"]
    for i in range(n_images):
        cls = classes[i % len(classes)]
        x1, y1 = int(rng.randint(10, 200)), int(rng.randint(10, 150))
        fixture.append((f"{i + 1:06d}", 500, 375,
                        [(cls, x1, y1, x1 + int(rng.randint(60, 250)),
                          y1 + int(rng.randint(60, 180)), 0)]))
    tmp = tempfile.mkdtemp(prefix="ait_bench_pipe_")
    devkit = os.path.join(tmp, "VOCdevkit2007")
    make_voc_devkit(devkit, image_set="trainval", fixture=fixture)

    cfg, model = _flagship()
    view = voc_data.filter_seen(
        voc_data.load_voc(devkit, "2007", "trainval"), 1)
    loader = OneShotLoader(view, cfg, training=True)

    params = init_params(model, cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
    state = jax.device_put(TrainState.create(params, tx), jax.devices()[0])
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    keys = list(jax.random.split(jax.random.PRNGKey(1), steps + 1))

    def stream():
        while True:  # re-epoch until `steps` batches
            yield from loader.train_epoch(BATCH, num_workers=workers)

    batches = device_prefetch(stream())
    it = iter(batches)
    # warmup: compile + first transfers
    state, metrics = step(state, next(it), keys[-1])
    float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, next(it), keys[i])
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps

    print(json.dumps({
        "metric": "SUSTAINED pairs/sec/chip (disk->loader->step, R50 VOC)",
        "value": round(BATCH / dt, 3),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(
            BATCH / dt / REFERENCE_PAIRS_PER_SEC_PER_CHIP, 2),
        "host_vcpus": os.cpu_count(),
        "workers": workers,
        "steps": steps,
    }))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--no-gate", action="store_true",
                    help="skip the on-device kernel parity gate")
    ap.add_argument("--pipeline", action="store_true",
                    help="sustained loader-included throughput instead of "
                         "the device-resident headline")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--workers", type=int, default=8)
    args = ap.parse_args()
    if args.pipeline:
        main_pipeline(steps=args.steps, workers=args.workers)
    else:
        main(gate=not args.no_gate)
