"""Train state + jitted train/eval steps.

Replaces the reference's epoch loop body (trainval_net_voc.py:362-423: staging
copies, forward, 5-loss sum, backward, clip, step) with one donated jit:
grads and the optimizer update happen on device; the per-replica loss
`.mean()` of DataParallel becomes the implicit psum of a batch-sharded pjit
program.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ait_tpu.config import Config
from ait_tpu.models.detector import AITDetector


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def batch_tuple(batch: Dict[str, jnp.ndarray]):
    return (batch["image"], batch["query"], batch["im_info"],
            batch["gt_boxes"], batch["num_boxes"])


def init_params(model: AITDetector, cfg: Config, rng, *, batch=None):
    """Initialize params with throwaway tiny shapes (shape-polymorphic model).

    Always runs on the host CPU backend: flax's init executes the forward
    EAGERLY op by op, and against a remote TPU (axon tunnel) every eager
    dispatch pays a network round trip — a full-canvas detector init was
    measured at 25+ minutes that way.  Params are small and the caller
    device_puts/replicates them anyway, so CPU init is semantics-free and
    takes seconds.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        # default_device only steers ops whose operands are uncommitted; a
        # caller-created rng key (or batch) lives COMMITTED on the default
        # accelerator, and every eager op touching it would follow it back
        # to the remote device — the exact crawl this wrapper exists to
        # avoid.  Pull the inputs onto the CPU first.
        rng = jax.device_put(rng, cpu)
        if batch is not None:
            batch = jax.device_put(batch, cpu)
        if batch is None:
            # params are canvas-independent (convs + fixed-width heads), so
            # init at a capped canvas — eager CPU init at 608x800 costs
            # minutes for nothing (__graft_entry__ inits at 160x160 and
            # restores into the full-canvas step)
            h, w = (min(d, 160) for d in cfg.tpu.image_size)
            q = cfg.TRAIN.query_size
            g = cfg.MAX_NUM_GT_BOXES
            batch = {
                "image": jnp.zeros((1, h, w, 3), jnp.float32),
                "query": jnp.zeros((1, q, q, 3), jnp.float32),
                "im_info": jnp.asarray([[h, w, 1.0]], jnp.float32),
                "gt_boxes": jnp.zeros((1, g, 5), jnp.float32),
                "num_boxes": jnp.zeros((1,), jnp.int32),
            }
        rngs = {"params": rng, "dropout": jax.random.PRNGKey(0),
                "sampling": jax.random.PRNGKey(1)}
        variables = model.init(rngs, *batch_tuple(batch), train=False)
    # return UNCOMMITTED host arrays: CPU-COMMITTED jax arrays silently pull
    # any downstream jit onto the CPU backend (jit honors the committed
    # device of its arguments), which made the kernel-parity gate's "jit
    # step" run on host while its shard_map twin ran on the TPU — a ~1e-2
    # cross-backend divergence masquerading as a parity failure
    import numpy as np
    return jax.tree_util.tree_map(np.asarray, variables["params"])


def grads_and_metrics(model: AITDetector, params, batch, rng,
                      accum_steps: int = 1):
    """(grads, metrics) for one optimizer step, optionally microbatched.

    With accum_steps == A > 1 the [B, ...] batch is processed as A
    microbatches of B/A under `lax.scan`, so peak activation memory is one
    microbatch deep while the optimizer sees the same effective batch — how
    a reference-recipe batch trains when it doesn't fit HBM (the reference
    has no equivalent; its batch is bounded by GPU count).  Grads are the
    mean over microbatches == the grad of the mean loss over the full
    batch; metrics: losses mean, fg/bg counts sum.  Each microbatch folds
    its index into the rng so dropout/sampling decorrelate.  A == 1 keeps
    the original single-pass program (the n=1 bitwise-parity gates ride on
    that).
    """

    def loss_fn(p, b, drop, samp):
        out = model.apply({"params": p}, *batch_tuple(b), train=True,
                          rngs={"dropout": drop, "sampling": samp})
        return out.total_loss, out

    def stats(loss, out):
        fg_cnt = jnp.sum(out.rois_label != 0)
        return {
            "loss": loss,
            "rpn_cls": out.rpn_loss_cls,
            "rpn_box": out.rpn_loss_box,
            "rcnn_cls": out.rcnn_loss_cls,
            "margin": out.margin_loss,
            "rcnn_box": out.rcnn_loss_bbox,
            "fg_cnt": jnp.float32(fg_cnt) * accum_steps,
            "bg_cnt": jnp.float32(out.rois_label.size - fg_cnt) *
            accum_steps,
        }

    if accum_steps == 1:
        drop, samp = jax.random.split(rng)
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, drop, samp)
        m = stats(loss, out)
        # single-pass metrics keep their historical dtypes/scale
        fg = jnp.sum(out.rois_label != 0)
        m["fg_cnt"], m["bg_cnt"] = fg, out.rois_label.size - fg
        return grads, m

    def micro(x):
        b = x.shape[0] // accum_steps
        assert x.shape[0] == b * accum_steps, (
            f"batch {x.shape[0]} not divisible by accum_steps={accum_steps}")
        return x.reshape((accum_steps, b) + x.shape[1:])

    mbatch = jax.tree_util.tree_map(micro, batch)

    def one(carry, xs):
        gsum, msum = carry
        b, i = xs
        drop, samp = jax.random.split(jax.random.fold_in(rng, i))
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, b, drop, samp)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        msum = jax.tree_util.tree_map(jnp.add, msum, stats(loss, out))
        return (gsum, msum), None

    zero_g = jax.tree_util.tree_map(jnp.zeros_like, params)
    zero_m = {k: jnp.zeros((), jnp.float32)
              for k in ("loss", "rpn_cls", "rpn_box", "rcnn_cls", "margin",
                        "rcnn_box", "fg_cnt", "bg_cnt")}
    (gsum, msum), _ = jax.lax.scan(
        one, (zero_g, zero_m),
        (mbatch, jnp.arange(accum_steps, dtype=jnp.int32)))
    inv = 1.0 / accum_steps
    grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
    metrics = {k: v * inv for k, v in msum.items()}
    return grads, metrics


def make_train_step(model: AITDetector, tx: optax.GradientTransformation,
                    accum_steps: int = 1) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics)."""

    def train_step(state: TrainState, batch, rng):
        grads, metrics = grads_and_metrics(
            model, state.params, batch,
            jax.random.fold_in(rng, state.step), accum_steps)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return train_step


def make_eval_step(model: AITDetector) -> Callable:
    def eval_step(params, batch):
        out = model.apply({"params": params}, *batch_tuple(batch),
                          train=False)
        return {"rois": out.rois, "cls_prob": out.cls_prob,
                "bbox_pred": out.bbox_pred}

    return eval_step


def make_fused_eval_step(model: AITDetector) -> Callable:
    """Shot-fused eval step: batch holds U unique images and their A query
    shots ('query' is [U, A, q, q, 3]); the image backbone runs at batch U
    and its features are gathered to the U*A pair rows (pair_image_idx), so
    the reference's `--a A` protocol pays the target-image backbone once
    instead of A times.  Outputs are pair-major [U*A, ...] with shot a of
    unique pair u at row u*A + a — numerically the same per-pair program as
    make_eval_step (the gather is exact)."""

    def eval_step(params, batch):
        image = batch["image"]
        query = batch["query"]
        u, a = query.shape[0], query.shape[1]
        p = u * a
        query = query.reshape((p,) + query.shape[2:])
        im_info = jnp.repeat(batch["im_info"], a, axis=0)
        idx = jnp.repeat(jnp.arange(u, dtype=jnp.int32), a)
        g = batch["gt_boxes"]
        gt = jnp.zeros((p,) + g.shape[1:], g.dtype)
        nb = jnp.zeros((p,), jnp.int32)
        out = model.apply({"params": params}, image, query, im_info,
                          gt, nb, train=False, pair_image_idx=idx)
        return {"rois": out.rois, "cls_prob": out.cls_prob,
                "bbox_pred": out.bbox_pred, "im_info": im_info}

    return eval_step
