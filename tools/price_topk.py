"""Price the proposal-layer pre-NMS top-k on chip.

The train-path proposal layer selects the top RPN_PRE_NMS_TOP_N=12000 of
22800 anchor scores per image (batch 8), tile-aligned to k_eff=12032
(ait_tpu/ops/nms.py:192-197).  This tool prices the current `lax.top_k`
against exact alternatives at the production shape:

  - topk:        lax.top_k(scores, k)                      (current)
  - sort_slice:  stable descending sort_key_val, slice k    (same output)
  - approx:      lax.approx_max_k(..., recall_target=1.0, aggregate_to_topk)
                 TPU PartialReduce custom call; exactness is CHECKED here
                 against topk, not assumed.

Each candidate also pays the downstream take_along_axis box gather
([B, N, 4] -> [B, k, 4]) so layout effects on the consumer are priced in.
Synced with a host transfer per iter (axon tunnel: block_until_ready does
not reliably block — PERFORMANCE.md round-2 note).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, N, K = 8, 22800, 12032


def run(fn, sc, bx, iters=30):
    out = fn(sc, bx)
    _ = float(out[0].sum()) + float(out[1].sum())  # compile + sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(sc, bx)
        _ = float(out[0][0, 0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, out


def gather(bx, idx):
    return jnp.take_along_axis(bx, idx[..., None], axis=1)


@jax.jit
def f_topk(sc, bx):
    v, i = lax.top_k(sc, K)
    return v, gather(bx, i)


@jax.jit
def f_sort(sc, bx):
    # is_stable so ties (e.g. NEG_INF-masked invalid rows in production
    # score tensors) break by index, matching lax.top_k's tie order.
    v, i = lax.sort_key_val(
        -sc, lax.broadcasted_iota(jnp.int32, sc.shape, 1), is_stable=True)
    return -v[:, :K], gather(bx, i[:, :K])


@jax.jit
def f_approx(sc, bx):
    v, i = lax.approx_max_k(sc, K, recall_target=1.0, aggregate_to_topk=True)
    return v, gather(bx, i)


def main():
    rng = np.random.default_rng(0)
    sc_np = rng.standard_normal((B, N)).astype(np.float32)
    # Production score tensors contain ties: NEG_INF on masked/invalid rows
    # and duplicated scores from padded anchors.  Inject both so the
    # exactness check below exercises tie-breaking, not just distinct keys.
    sc_np[:, -500:] = np.float32(-1e30)
    sc_np[:, 100:200] = sc_np[:, 0:100]
    sc = jnp.asarray(sc_np)
    bx = jnp.asarray(rng.standard_normal((B, N, 4)), jnp.float32)

    t_ref, (v_ref, b_ref) = run(f_topk, sc, bx)
    print(f"topk       {t_ref:7.3f} ms")
    t, (v, b) = run(f_sort, sc, bx)
    ok = bool(jnp.array_equal(v, v_ref)) and bool(jnp.array_equal(b, b_ref))
    print(f"sort_slice {t:7.3f} ms  bitwise=={ok}")
    t, (v, b) = run(f_approx, sc, bx)
    ok = bool(jnp.array_equal(v, v_ref)) and bool(jnp.array_equal(b, b_ref))
    print(f"approx     {t:7.3f} ms  bitwise=={ok}")


if __name__ == "__main__":
    main()
