"""Pallas NMS sweep kernel vs the XLA reference (interpret mode, CPU).

The kernel must be bit-identical to ops.nms.nms_keep_mask per image for the
first `max_out` survivors (the only bits callers consume) — including the
survivor-cap early exit and padded-row handling.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ait_tpu.ops.nms import batched_nms_topk, nms_keep_mask
from ait_tpu.ops.nms_pallas import nms_keep_mask_batched


def clustered_boxes(rng, b, n):
    ctr = rng.rand(b, n, 2) * 200
    wh = 20 + rng.rand(b, n, 2) * 60
    boxes = np.concatenate([ctr - wh / 2, ctr + wh / 2], axis=-1)
    scores = rng.rand(b, n).astype(np.float32)
    order = np.argsort(-scores, axis=1)
    return (np.take_along_axis(boxes.astype(np.float32), order[..., None],
                               axis=1), scores)


@pytest.mark.parametrize("max_out", [None, 64])
def test_keep_mask_parity(rng, max_out):
    b, n = 3, 777
    sboxes, _ = clustered_boxes(rng, b, n)
    valid = np.ones((b, n), bool)
    valid[:, -60:] = False

    want = np.stack([
        np.asarray(nms_keep_mask(jnp.asarray(sboxes[i]),
                                 jnp.asarray(valid[i]), 0.5, tile=256,
                                 max_out=max_out)) for i in range(b)])
    got = np.asarray(nms_keep_mask_batched(
        jnp.asarray(sboxes), jnp.asarray(valid), 0.5, tile=256,
        max_out=max_out, interpret=True))
    if max_out is None:
        np.testing.assert_array_equal(got, want)
    else:
        for i in range(b):
            np.testing.assert_array_equal(np.where(got[i])[0][:max_out],
                                          np.where(want[i])[0][:max_out])


def test_batched_nms_topk_dispatch_equivalence(rng):
    """use_pallas=True on CPU routes to the XLA branch (platform gate) and
    must produce identical proposals to use_pallas=False."""
    b, n = 2, 500
    boxes, scores = clustered_boxes(rng, b, n)
    for kw in ({"use_pallas": True}, {"use_pallas": False}):
        out = batched_nms_topk(jnp.asarray(boxes), jnp.asarray(scores),
                               0.7, 400, 64, **kw)
        if kw["use_pallas"]:
            ref = out
        else:
            for a, bb in zip(ref, out):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_aligned_pre_topk_is_exact_truncation(rng):
    """k_eff tile-alignment takes extra candidates but marks them invalid:
    results must equal running on an exactly pre-truncated candidate set."""
    b, n, pre, post = 2, 700, 300, 64  # pre unaligned to the 256 tile
    boxes, scores = clustered_boxes(rng, b, n)
    full = batched_nms_topk(jnp.asarray(boxes), jnp.asarray(scores),
                            0.6, pre, post, use_pallas=False)
    order = np.argsort(-scores, axis=1)[:, :pre]
    tb = np.take_along_axis(boxes, order[..., None], axis=1)
    ts = np.take_along_axis(scores, order, axis=1)
    trunc = batched_nms_topk(jnp.asarray(tb), jnp.asarray(ts),
                             0.6, pre, post, use_pallas=False)
    for a, c in zip(full, trunc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
