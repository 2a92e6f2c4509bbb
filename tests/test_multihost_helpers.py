"""Unit tests for the pod glue in parallel/multihost.py.

The cross-process semantics (identical merged mAP on every host) are gated
end-to-end by tools/dryrun_multihost.py; these pin the single-process
fast paths and the pure merge logic.
"""

import numpy as np

import jax.numpy as jnp

from ait_tpu.parallel import (allgather_object, host_local_rows,
                              maybe_init_distributed, merge_all_boxes)


def test_merge_all_boxes_unions_disjoint_host_dicts():
    h0 = {1: {0: "a", 2: "b"}, 3: {4: "c"}}
    h1 = {1: {1: "d"}, 2: {0: "e"}}
    merged = merge_all_boxes([h0, h1])
    assert merged == {1: {0: "a", 1: "d", 2: "b"}, 2: {0: "e"}, 3: {4: "c"}}
    # inputs unchanged (merge must not mutate a host's own dict)
    assert h0 == {1: {0: "a", 2: "b"}, 3: {4: "c"}}


def test_allgather_object_single_process_identity():
    obj = {7: {3: np.arange(4, dtype=np.float32)}}
    out = allgather_object(obj)
    assert len(out) == 1 and out[0] is obj


def test_host_local_rows_single_process_passthrough():
    a = jnp.arange(12.0).reshape(3, 4)
    out = host_local_rows(a)
    np.testing.assert_array_equal(out, np.asarray(a))


def test_maybe_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    calls = []
    maybe_init_distributed(log=calls.append)
    assert calls == []
