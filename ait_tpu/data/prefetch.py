"""Device prefetch: overlap host->device transfer with the running step.

The reference stages batches into reused CUDA buffers synchronously
(trainval_net_voc.py:364-368).  Here the next batch's device_put is issued
while the current step executes (jax transfers are async), so H2D rides
under compute — important when the link is slow relative to the step.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp


def device_prefetch(batches: Iterable[Any], size: int = 2,
                    sharding: Optional[Any] = None) -> Iterator[Any]:
    """Yield device-resident batches, keeping `size` transfers in flight.

    `sharding` is a jax.sharding.Sharding (e.g. batch_sharding(mesh)) or
    None for the default device.
    """

    multihost = jax.process_count() > 1

    def put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jnp.asarray, batch)
        if multihost:
            # each host holds only its slice of the global batch (the
            # loader's per-host shard); assemble the global array from the
            # process-local pieces — no host ever materializes the full batch
            return jax.tree_util.tree_map(
                lambda x: jax.make_array_from_process_local_data(sharding, x),
                batch)
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), batch)

    queue: collections.deque = collections.deque()
    it = iter(batches)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
        yield out
