"""Profiling helpers.

The reference's only tracing was hand-inserted `time.time()` spans left in
comments (SURVEY.md §5).  Here: a `timed` context that blocks on device work
(so spans mean what they say under async dispatch), and a thin wrapper over
`jax.profiler` for capturing device traces viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def timed(name: str, results: Optional[dict] = None, sync=None):
    """Wall-time a block; `sync` is an array/pytree to block_until_ready."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    dt = time.perf_counter() - t0
    if results is not None:
        results[name] = results.get(name, 0.0) + dt
    else:
        print(f"[timed] {name}: {dt * 1e3:.2f} ms", flush=True)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (open with TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that shows up in device traces."""
    return jax.profiler.TraceAnnotation(name)
