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
    """Initialize params with throwaway tiny shapes (shape-polymorphic model)."""
    if batch is None:
        h, w = cfg.tpu.image_size
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
    return variables["params"]


def make_train_step(model: AITDetector, tx: optax.GradientTransformation
                    ) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics)."""

    def train_step(state: TrainState, batch, rng):
        drop, samp = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            out = model.apply({"params": params}, *batch_tuple(batch),
                              train=True,
                              rngs={"dropout": drop, "sampling": samp})
            return out.total_loss, out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        fg_cnt = jnp.sum(out.rois_label != 0)
        metrics = {
            "loss": loss,
            "rpn_cls": out.rpn_loss_cls,
            "rpn_box": out.rpn_loss_box,
            "rcnn_cls": out.rcnn_loss_cls,
            "margin": out.margin_loss,
            "rcnn_box": out.rcnn_loss_bbox,
            "fg_cnt": fg_cnt,
            "bg_cnt": out.rois_label.size - fg_cnt,
        }
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
