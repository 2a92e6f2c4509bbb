"""One-claim chip session for the round-4 measurements.

The axon pool grants the single dev chip to one client at a time, and a
killed (or even just recently-exited) client's lease can block the next
claim for many minutes — so every on-chip measurement this round runs in
THIS one process, serially: train-step batch sweep (MFU), serving
re-profile, sustained loader-included pipeline throughput.  Each stage
prints one JSON line; a stage failure is recorded and the next stage still
runs.  Usage: python tools/round4_chipjobs.py [--skip sweep,serve,pipe]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_default_prng_impl", "rbg")
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_CACHE_DIR", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def stage(name, fn):
    t0 = time.time()
    print(f"=== stage {name} start", flush=True)
    try:
        fn()
        print(json.dumps({"stage": name, "ok": True,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
    except Exception:
        traceback.print_exc()
        print(json.dumps({"stage": name, "ok": False,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="", help="comma list: sweep,serve,pipe")
    ap.add_argument("--sweep_sizes", type=int, nargs="+", default=[8, 16, 32])
    ap.add_argument("--pipe_steps", type=int, default=20)
    ap.add_argument("--pipe_workers", type=int, default=8)
    args = ap.parse_args(argv)
    skip = set(args.skip.split(","))

    # claim the chip once, up front, with a visible timestamp
    t0 = time.time()
    dev = jax.devices()[0]
    print(f"claimed {dev} in {time.time() - t0:.1f}s", flush=True)

    if "sweep" not in skip:
        import batch_sweep

        stage("batch_sweep", lambda: batch_sweep.main(
            ["--sizes", *map(str, args.sweep_sizes)]))
    if "serve" not in skip:
        import serve_bench

        stage("serve_bench", serve_bench.main)
    if "pipe" not in skip:
        import bench

        stage("pipeline", lambda: bench.main_pipeline(
            steps=args.pipe_steps, workers=args.pipe_workers))


if __name__ == "__main__":
    main()
