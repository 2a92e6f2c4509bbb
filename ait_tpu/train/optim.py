"""Optimizer: SGD with the reference's per-parameter groups, as optax labels.

The reference builds one param-group per tensor (trainval_net_voc.py:289-296):
  * biases: lr x (1 + DOUBLE_BIAS), weight decay only if BIAS_DECAY;
  * weights: lr, WEIGHT_DECAY;
  * params with requires_grad=False (stem conv/bn + every BatchNorm affine,
    resnet_sys_transformer_sk_dilat.py:260-261,435-441) are excluded.
Optionally Adam (trainval_net_voc.py:298-303).  Note the reference's
`lr = lr * 0.1` there is display-only: every param group carries an
explicit 'lr' key that overrides the optimizer-level default, so its Adam
actually steps at the group lrs (base / 2x-bias).  The CLI here passes
args.lr unscaled, matching the real behavior.

Weight decay is torch-style coupled L2 (added to the gradient before the
momentum buffer), reproduced here as add_decayed_weights before trace.

The LR schedule is the reference's step decay: x GAMMA every
`lr_decay_step` epochs (adjust_learning_rate, net_utils.py:67-70).
"""

from __future__ import annotations

import jax
import optax

from ait_tpu.config import Config

FROZEN_BN_PARAMS = ("mean", "var")
BN_MODULE_NAMES = ("bn1", "bn2", "bn3", "downsample_bn")


def param_label(path) -> str:
    """'frozen' | 'bias' | 'weight' for one param path (tuple of str keys)."""
    keys = [getattr(k, "key", str(k)) for k in path]
    leaf = keys[-1]
    parent = keys[-2] if len(keys) > 1 else ""
    if leaf in FROZEN_BN_PARAMS:
        return "frozen"
    if parent in BN_MODULE_NAMES:
        return "frozen"  # frozen BN scale/bias
    # stem conv1 + bn1 of the backbone are excluded from the optimizer
    if len(keys) >= 2 and keys[0] == "backbone" and keys[1] == "conv1":
        return "frozen"
    # vgg16: "fix the layers before conv3" (vgg16.py:40-42) = conv1_*/conv2_*
    if len(keys) >= 2 and keys[0] == "backbone" and (
            keys[1].startswith("conv1_") or keys[1].startswith("conv2_")):
        return "frozen"
    # the reference groups any param whose *name* contains 'bias'
    # (trainval_net_voc.py:291) — that includes the torch RNN biases
    # bias_ih_l*/bias_hh_l*, which here are the b_ih/b_hh leaves of
    # ContextualRelation._RNNDirection.
    if leaf == "bias" or leaf.startswith("b_") or "bias" in leaf:
        return "bias"
    return "weight"


def make_param_labels(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: param_label(path), params)


def lr_schedule(base_lr: float, steps_per_epoch: int, decay_step_epochs: int,
                gamma: float, warmup_steps: int = 0):
    """Step decay: lr * gamma^floor(epoch / decay_step).

    Optional linear warmup over `warmup_steps` — the reference ships (but
    never wires) a GradualWarmupScheduler (model/warmup_scheduler/
    scheduler.py); here it's one knob.
    """
    decay = optax.exponential_decay(
        base_lr, transition_steps=decay_step_epochs * steps_per_epoch,
        decay_rate=gamma, staircase=True)
    if not warmup_steps:
        return decay
    warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warmup, decay], [warmup_steps])


def make_optimizer(cfg: Config, schedule, *, optimizer: str = "sgd",
                   clip_norm: float | None = None) -> optax.GradientTransformation:
    """schedule: optax schedule (or constant float) for the base lr."""
    t = cfg.TRAIN
    if callable(schedule):
        bias_sched = lambda step: schedule(step) * (1 + int(t.DOUBLE_BIAS))
    else:
        bias_sched = float(schedule) * (1 + int(t.DOUBLE_BIAS))
    bias_wd = t.WEIGHT_DECAY if t.BIAS_DECAY else 0.0

    def sgd(lr, wd):
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.trace(decay=t.MOMENTUM))
        parts.append(optax.scale_by_learning_rate(lr))
        return optax.chain(*parts)

    def adam(lr, wd):
        parts = []
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.scale_by_adam())
        parts.append(optax.scale_by_learning_rate(lr))
        return optax.chain(*parts)

    make = sgd if optimizer == "sgd" else adam
    tx = optax.multi_transform(
        {"weight": make(schedule, t.WEIGHT_DECAY),
         "bias": make(bias_sched, bias_wd),
         "frozen": optax.set_to_zero()},
        make_param_labels)
    if clip_norm:
        # reference clips the total norm for vgg16 only
        # (trainval_net_voc.py:421-422, net_utils.py:37-48)
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx
