"""Device mesh + sharding helpers.

The reference's only parallelism is single-process nn.DataParallel
(trainval_net_voc.py:321-326): replicate params, scatter the batch, gather and
`.mean()` the per-replica losses.  Here the same (and more) falls out of one
pjit program over a named mesh: the batch is sharded on the 'data' axis,
params are replicated, and XLA inserts the psum gradient reduction over
ICI/DCN — no hand-written communication.

The mesh is 1-D ('data') today but every helper takes the axis names from the
config so tensor/pipeline axes can be added without touching call sites.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Mesh over the first n devices.

    `shape` gives the per-axis sizes for a multi-axis mesh (e.g.
    axes=("data", "model"), shape=(4, 2)); without it a multi-axis mesh is
    laid out as a hypercube.  Axis order matters for ICI locality: the LAST
    axis varies fastest over neighboring devices, so put the
    latency-sensitive axis (tp/model) last.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if shape is not None:
        assert len(shape) == len(axes), (shape, axes)
        arr = arr.reshape(tuple(shape))
    elif len(axes) > 1:
        side = round(len(devices) ** (1.0 / len(axes)))
        arr = arr.reshape((side,) * len(axes))
    return Mesh(arr, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (the global batch) over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """device_put a pytree of [B, ...] arrays, batch-sharded."""
    ns = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, ns), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    ns = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, ns), tree)
