"""Multi-host (pod) helpers shared by the CLIs.

The reference is single-host (its only parallelism is one-process
nn.DataParallel, trainval_net_voc.py:321-326); here the train AND eval CLIs
run the same program on every pod host (SPMD), with the loader feeding each
host only its slice (data/loader.py) and these helpers handling the
process-level glue: runtime init from env, per-host rows of a global array,
and object merging across hosts.
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def maybe_init_distributed(log=print) -> None:
    """Initialize jax.distributed when launched under a pod coordinator.

    Cluster schedulers JAX knows (GKE, SLURM, ...) are auto-detected by a
    bare `initialize()`; generic launches pass JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID explicitly (this is what
    tools/dryrun_multihost.py's 2-process CPU gate does)."""
    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if not addr:
        return
    if os.environ.get("JAX_NUM_PROCESSES"):
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    else:
        jax.distributed.initialize()  # scheduler auto-detect
    log(f"jax.distributed initialized: process "
        f"{jax.process_index()}/{jax.process_count()}")


def host_local_rows(arr) -> np.ndarray:
    """This host's dim-0 rows of a global batch-sharded array.

    With the loader's per-host input sharding the addressable shards are
    exactly the rows this host produced; single-process arrays pass
    through whole."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    shards = sorted(arr.addressable_shards,
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def allgather_object(obj: Any) -> list:
    """All processes' `obj`s, as a list indexed by process — a pickle blob
    padded to the max size rides ONE process_allgather."""
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils as mhu

    blob = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(mhu.process_allgather(
        jnp.asarray([blob.size], np.int32))).ravel()
    buf = np.zeros(int(sizes.max()), np.uint8)
    buf[:blob.size] = blob
    blobs = np.asarray(mhu.process_allgather(jnp.asarray(buf)))
    return [pickle.loads(blobs[i, :int(sizes[i])].tobytes())
            for i in range(jax.process_count())]


def merge_all_boxes(parts: list) -> dict:
    """Union of per-host all_boxes[class][record_index] dicts (disjoint by
    construction: each pair is evaluated by exactly one host)."""
    merged: dict = {}
    for part in parts:
        for ci, recs in part.items():
            merged.setdefault(ci, {}).update(recs)
    return merged
