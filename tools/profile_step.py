#!/usr/bin/env python
"""Capture a device trace of the train step and print per-op totals.

Aggregates the perfetto trace's TPU-lane slices by (fusion) op name over N
steps — the tool behind PERFORMANCE.md's "measured decomposition" table.
Usage: python tools/profile_step.py [--steps 5] [--eval] [--top 40]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def parse_trace(log_dir, steps):
    files = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise SystemExit(f"no trace files under {log_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        doc = json.load(f)
    events = doc.get("traceEvents", [])
    # device lanes: pid names containing "TPU" and not host threads
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name or "XLA" in name:
                device_pids.add(e["pid"])
    totals = collections.Counter()
    count = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        totals[name] += e.get("dur", 0)
        count[name] += 1
    return totals, count


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--eval", action="store_true")
    p.add_argument("--out", default=None, help="keep the trace dir here")
    args = p.parse_args()

    from __graft_entry__ import _batch, _flagship, _init_params
    from ait_tpu.train import (TrainState, lr_schedule, make_eval_step,
                               make_optimizer, make_train_step)

    cfg, model = _flagship()
    h, w = cfg.tpu.image_size
    batch = _batch(8, h, w, g=cfg.MAX_NUM_GT_BOXES)
    params = _init_params(model, _batch(1, 160, 160))
    if args.eval:
        step_fn = jax.jit(make_eval_step(model))

        def run():
            return step_fn(params, batch)
    else:
        tx = make_optimizer(cfg, lr_schedule(0.01, 100, 4, 0.1))
        state = TrainState.create(params, tx)
        # donate like bench.py so the persistent-cache entry is shared
        train = jax.jit(make_train_step(model, tx), donate_argnums=0)
        rng = jax.random.PRNGKey(0)
        holder = {"state": state}

        def run():
            holder["state"], m = train(holder["state"], batch, rng)
            return m

    for _ in range(2):
        jax.block_until_ready(jax.device_get(run()))

    log_dir = args.out or tempfile.mkdtemp(prefix="ait_trace_")
    jax.profiler.start_trace(log_dir)
    for _ in range(args.steps):
        out = run()
    jax.block_until_ready(jax.device_get(out))
    jax.profiler.stop_trace()

    totals, count = parse_trace(log_dir, args.steps)
    total_us = sum(totals.values())
    print(f"\ndevice total: {total_us / args.steps / 1e3:.2f} ms/step "
          f"over {args.steps} steps  (trace: {log_dir})")
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>5}  op")
    for name, us in totals.most_common(args.top):
        print(f"{us / args.steps / 1e3:9.3f}  {100 * us / total_us:5.1f}  "
              f"{count[name]:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
